package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 21: graph-based ANN search — the missing rung of
  * the ANN ladder — and the variance-ratio market-efficiency test.
  *
  *  - `sim_graph_greedy`: greedy beam search over a directed k-NN
  *    graph (the HNSW/DiskANN paradigm, distinct from the
  *    brute/LSH/IVF/PQ/SQ8 rungs already in the catalog): from a
  *    fixed entry point, 3 hops of expand-neighbors → score → keep
  *    beam-4, per query. The report pairs the found neighbor with
  *    the exact top-1 so recall is auditable; everything ties break
  *    on (sim DESC, id) so both engines walk the identical path.
  *    The k-NN edges reuse the catalog's SRP-bucket construction
  *    (`sim_knn_graph`), directed with k = 4.
  *  - `ts_variance_ratio`: Lo–MacKinlay variance ratio VR(2) per
  *    event type on the daily-mean series — var of 2-day changes
  *    over twice the var of 1-day changes, ≈1 under a random walk,
  *    <1 mean-reverting, >1 trending. All moments integer
  *    (n·Σd²−(Σd)² ≥ 0), the ratio in micro units by floor
  *    division.
  *
  * 100 TB shapes: graph-ANN queries touch beam×k rows per hop — the
  * whole point of the paradigm; the index build (knn edges) is the
  * LSH-bounded candidate join built ONCE. The variance ratio is two
  * lag self-joins on the |types|×|days| pre-aggregate.
  */
object Ext58Queries {

  private val Beam = 4
  private val Hops = 3

  // ---------------------------------------------------------------
  // sim_graph_greedy
  // ---------------------------------------------------------------

  def graphGreedy(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket",
        Similarity.srpBucket(col("embedding"), planes = 6, dims = 64))
      .withColumn("nrm", Similarity.norm(col("embedding")))
      .cache()
    // directed knn edges, k=4, inside SRP buckets
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      col("bucket"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      col("bucket").as("bucket_b"), col("nrm").as("nb"))
    val wE = Window.partitionBy("id_a")
      .orderBy(col("esim").desc, col("id_b"))
    val edges = a.join(b, col("bucket") === col("bucket_b")
        && col("id_a") =!= col("id_b"))
      .withColumn("esim", round(Similarity.dot(col("va"), col("vb"))
        / (col("na") * col("nb")), 6))
      .withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= Beam)
      .select("id_a", "id_b").cache()
    val q = e.filter(col("vec_id") >= 200 && col("vec_id") < 208)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"),
        col("nrm").as("qn"))
    val entry = e.agg(min("vec_id").as("cand"))
    // cands must carry (q_id, cand); the query side is an 8-row
    // broadcast, self-pairs filtered
    def score(cands: DataFrame): DataFrame = cands
      .join(e.select(col("vec_id").as("cand"),
        col("embedding").as("cv"), col("nrm").as("cn")), "cand")
      .join(broadcast(q), "q_id")
      .filter(col("cand") =!= col("q_id"))
      .withColumn("sim", round(Similarity.dot(col("qv"), col("cv"))
        / (col("qn") * col("cn")), 6))
      .select("q_id", "cand", "sim")
    val wQ = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("cand"))
    var beam = score(q.select("q_id").crossJoin(broadcast(entry)))
      .withColumn("rk", row_number().over(wQ))
      .filter(col("rk") <= Beam).select("q_id", "cand", "sim").cache()
    for (_ <- 1 to Hops) {
      val expanded = beam.select("q_id", "cand")
        .unionByName(beam.join(edges, beam("cand") === edges("id_a"))
          .select(col("q_id"), col("id_b").as("cand")))
        .distinct()
      // re-score the deduped frontier; keep beam-k per query
      beam = score(expanded)
        .withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= Beam).select("q_id", "cand", "sim").cache()
    }
    val found = beam.withColumn("rk", row_number().over(wQ))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("cand").as("found_id"),
        col("sim").as("found_sim"))
    // the exact pass is the brute-force scan (the audit baseline)
    val exact = score(q.select("q_id")
        .crossJoin(e.select(col("vec_id").as("cand"))))
      .withColumn("rk", row_number().over(wQ))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("cand").as("exact_id"),
        col("sim").as("exact_sim"))
    found.join(exact, "q_id")
      .withColumn("hit",
        when(col("found_id") === col("exact_id"), 1L).otherwise(0L))
      .orderBy("q_id")
  }

  // ---------------------------------------------------------------
  // ts_variance_ratio
  // ---------------------------------------------------------------

  def varianceRatio(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day")
      .agg(expr("(sum(vm) - pmod(sum(vm), count(*))) div count(*)")
        .as("m")).cache()
    def diffs(lagK: Int): DataFrame = daily
      .join(daily.select(col("event_type"),
        (col("day") + lagK).as("day"), col("m").as("m_prev")),
        Seq("event_type", "day"))
      .select(col("event_type"), (col("m") - col("m_prev")).as("d"))
    def scaledVar(k: Int): DataFrame = diffs(k)
      .groupBy("event_type")
      .agg(count(lit(1)).as(s"n$k"),
        (count(lit(1)) * sum(col("d") * col("d"))
          - sum("d") * sum("d")).as("s2"))
      .withColumn(s"var$k",
        expr(s"s2 div (n$k * n$k)")) // floor variance, nonneg
      .select(col("event_type"), col(s"n$k"), col(s"var$k"))
    scaledVar(1).join(scaledVar(2), "event_type")
      .withColumn("vr_micro", expr(
        "case when var1 > 0 then var2 * 1000000 div (2 * var1)" +
          " else 0L end"))
      .select("event_type", "n1", "var1", "n2", "var2", "vr_micro")
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_graph_greedy" -> graphGreedy _,
    "ts_variance_ratio" -> varianceRatio _,
  )

  /** SRP buckets + directed k=4 knn edges + per-query scoring —
    * shared CTE prefix for the greedy-search oracle (the
    * sim_knn_graph construction, directed).
    */
  private val greedyPrefix: String =
    """WITH ee AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), contrib AS (
      |  SELECT vec_id, p,
      |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
      |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0
      |      END) AS c
      |  FROM ee, UNNEST(range(0, 6)) AS pl(p)
      |  GROUP BY vec_id, p
      |), buckets AS (
      |  SELECT vec_id,
      |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
      |      ORDER BY p) AS bucket
      |  FROM contrib GROUP BY vec_id
      |), norms AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
      |), cand AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM buckets a JOIN buckets b
      |    ON b.bucket = a.bucket AND b.vec_id <> a.vec_id
      |), dots AS (
      |  SELECT c.id_a, c.id_b, SUM(ea.x * eb.x) AS dot
      |  FROM cand c
      |  JOIN ee ea ON ea.vec_id = c.id_a
      |  JOIN ee eb ON eb.vec_id = c.id_b AND eb.i = ea.i
      |  GROUP BY c.id_a, c.id_b
      |), edges AS (
      |  SELECT id_a, id_b FROM (
      |    SELECT d.id_a, d.id_b,
      |      ROW_NUMBER() OVER (PARTITION BY d.id_a ORDER BY
      |        ROUND(d.dot / (na.nrm * nb.nrm), 6) DESC, d.id_b) AS rk
      |    FROM dots d
      |    JOIN norms na ON na.vec_id = d.id_a
      |    JOIN norms nb ON nb.vec_id = d.id_b)
      |  WHERE rk <= 4
      |), q AS (
      |  SELECT vec_id AS q_id FROM embeddings
      |  WHERE vec_id >= 200 AND vec_id < 208
      |), sims AS (
      |  SELECT q.q_id, e2.vec_id AS cand,
      |    ROUND(SUM(eq.x * e2.x) / (nq.nrm * n2.nrm), 6) AS sim
      |  FROM q
      |  JOIN ee eq ON eq.vec_id = q.q_id
      |  JOIN ee e2 ON e2.i = eq.i AND e2.vec_id <> q.q_id
      |  JOIN norms nq ON nq.vec_id = q.q_id
      |  JOIN norms n2 ON n2.vec_id = e2.vec_id
      |  GROUP BY q.q_id, e2.vec_id, nq.nrm, n2.nrm
      |), entry AS (SELECT MIN(vec_id) AS cand FROM embeddings)""".stripMargin

  private def beamRound(k: Int): String = {
    val prev = if (k == 0) "beam0" else s"beam$k"
    s""", exp$k AS (
       |  SELECT DISTINCT q_id, cand FROM (
       |    SELECT q_id, cand FROM $prev
       |    UNION ALL
       |    SELECT b.q_id, e.id_b AS cand
       |    FROM $prev b JOIN edges e ON e.id_a = b.cand)
       |), beam${k + 1} AS (
       |  SELECT q_id, cand, sim FROM (
       |    SELECT x.q_id, x.cand, s.sim,
       |      ROW_NUMBER() OVER (PARTITION BY x.q_id
       |        ORDER BY s.sim DESC, x.cand) AS rk
       |    FROM exp$k x JOIN sims s ON s.q_id = x.q_id
       |      AND s.cand = x.cand)
       |  WHERE rk <= 4
       |)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "sim_graph_greedy" ->
      (greedyPrefix + """, beam0 AS (
        |  SELECT q_id, cand, sim FROM (
        |    SELECT q.q_id, en.cand, s.sim,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id
        |        ORDER BY s.sim DESC, en.cand) AS rk
        |    FROM q CROSS JOIN entry en
        |    JOIN sims s ON s.q_id = q.q_id AND s.cand = en.cand)
        |  WHERE rk <= 4
        |)""".stripMargin +
        (0 until 3).map(beamRound).mkString +
        """, found AS (
        |  SELECT q_id, cand AS found_id, sim AS found_sim FROM (
        |    SELECT q_id, cand, sim, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand) AS rk
        |    FROM beam3) WHERE rk = 1
        |), exact AS (
        |  SELECT q_id, cand AS exact_id, sim AS exact_sim FROM (
        |    SELECT q_id, cand, sim, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand) AS rk
        |    FROM sims) WHERE rk = 1
        |)
        |SELECT f.q_id, f.found_id, f.found_sim, x.exact_id,
        |  x.exact_sim,
        |  CASE WHEN f.found_id = x.exact_id THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS hit
        |FROM found f JOIN exact x ON x.q_id = f.q_id
        |ORDER BY f.q_id""".stripMargin),
    "ts_variance_ratio" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    (SUM(CAST(round(value * 1000) AS BIGINT))
        |      - ((SUM(CAST(round(value * 1000) AS BIGINT)) % count(*))
        |         + count(*)) % count(*)) // count(*) AS m
        |  FROM events GROUP BY 1, 2
        |), d1 AS (
        |  SELECT x.event_type, x.m - p.m AS d
        |  FROM daily x JOIN daily p ON p.event_type = x.event_type
        |    AND p.day = x.day - 1
        |), d2 AS (
        |  SELECT x.event_type, x.m - p.m AS d
        |  FROM daily x JOIN daily p ON p.event_type = x.event_type
        |    AND p.day = x.day - 2
        |), v1 AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n1,
        |    CAST((count(*) * SUM(d * d) - SUM(d) * SUM(d))
        |      // (count(*) * count(*)) AS BIGINT) AS var1
        |  FROM d1 GROUP BY event_type
        |), v2 AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n2,
        |    CAST((count(*) * SUM(d * d) - SUM(d) * SUM(d))
        |      // (count(*) * count(*)) AS BIGINT) AS var2
        |  FROM d2 GROUP BY event_type
        |)
        |SELECT v1.event_type, v1.n1, v1.var1, v2.n2, v2.var2,
        |  CAST(CASE WHEN v1.var1 > 0
        |    THEN v2.var2 * 1000000 // (2 * v1.var1)
        |    ELSE 0 END AS BIGINT) AS vr_micro
        |FROM v1 JOIN v2 ON v2.event_type = v1.event_type
        |ORDER BY v1.event_type""".stripMargin,
  )
}
