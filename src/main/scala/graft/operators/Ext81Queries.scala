package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch I: the recall audit that justifies multi-probe LSH —
  * per query, recall@5 against the exact cosine top-5 for the
  * single-bucket index and the Hamming-1 multi-probe of the SAME
  * index, side by side (the eval_lsh_recall discipline applied to
  * sim_ann_multiprobe: a recall knob is only real if its gain is
  * measured against ground truth, not asserted).
  */
object Ext81Queries {

  /** 100 TB shape: ground truth is the broadcast-query brute pass the
    * sim_cosine_topk baseline already pays (at production scale the
    * audit runs on a sampled query set, exactly like eval_ann_recall);
    * both candidate legs are keyed bucket equi-joins; the final
    * reduction is per-query over ≤ 15 rows.
    */
  def multiprobeRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 5)
      .select(col("q_id"), col("n_id"))
    val single = Similarity
      .lshTopK(emb, q, "vec_id", "embedding", 5, planes = 8, dims = 64)
      .select(col("q_id"), col("n_id"), lit(1L).as("hs"))
    val multi = Ext75Queries.simAnnMultiprobe(spark, dir)
      .select(col("q_id"), col("n_id"), lit(1L).as("hm"))
    exact
      .join(single, Seq("q_id", "n_id"), "left")
      .join(multi, Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hs"), lit(0L))).as("hit_single"),
        sum(coalesce(col("hm"), lit(0L))).as("hit_multi"))
      .withColumn("recall_single_micro",
        expr("hit_single * 1000000 div n_exact"))
      .withColumn("recall_multi_micro",
        expr("hit_multi * 1000000 div n_exact"))
      .orderBy("q_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_multiprobe_recall" -> multiprobeRecall _,
  )

  val oracle: Map[String, String] = Map(
    "eval_multiprobe_recall" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), sims AS (
        |  SELECT d.q_id, d.n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), exact AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY sim DESC, n_id) AS rank
        |    FROM sims) WHERE rank <= 5
        |), contrib AS (
        |  SELECT vec_id, p,
        |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
        |      AS c
        |  FROM ee, UNNEST(range(0, 8)) AS pl(p)
        |  GROUP BY vec_id, p
        |), buckets AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY p) AS bucket
        |  FROM contrib GROUP BY vec_id
        |), single AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT s.q_id, s.n_id,
        |      ROW_NUMBER() OVER (PARTITION BY s.q_id
        |        ORDER BY s.sim DESC, s.n_id) AS rank
        |    FROM sims s
        |    JOIN buckets bq ON bq.vec_id = s.q_id
        |    JOIN buckets be ON be.vec_id = s.n_id
        |      AND be.bucket = bq.bucket) WHERE rank <= 5
        |), probes AS (
        |  SELECT b.vec_id AS q_id,
        |    CASE WHEN f.flip = -1 THEN b.bucket
        |    ELSE substr(b.bucket, 1, CAST(f.flip AS INT))
        |      || (CASE WHEN substr(b.bucket, CAST(f.flip AS INT) + 1, 1)
        |            = '1' THEN '0' ELSE '1' END)
        |      || substr(b.bucket, CAST(f.flip AS INT) + 2, 8) END
        |      AS probe
        |  FROM buckets b, UNNEST(range(-1, 8)) AS f(flip)
        |  WHERE b.vec_id < 8
        |), multi AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT s.q_id, s.n_id,
        |      ROW_NUMBER() OVER (PARTITION BY s.q_id
        |        ORDER BY s.sim DESC, s.n_id) AS rank
        |    FROM sims s
        |    JOIN probes p ON p.q_id = s.q_id
        |    JOIN buckets be ON be.vec_id = s.n_id
        |      AND be.bucket = p.probe) WHERE rank <= 5
        |)
        |SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(CASE WHEN s.n_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hit_single,
        |  CAST(SUM(CASE WHEN m.n_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS hit_multi,
        |  CAST(SUM(CASE WHEN s.n_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS recall_single_micro,
        |  CAST(SUM(CASE WHEN m.n_id IS NOT NULL THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS recall_multi_micro
        |FROM exact e
        |LEFT JOIN single s ON s.q_id = e.q_id AND s.n_id = e.n_id
        |LEFT JOIN multi m ON m.q_id = e.q_id AND m.n_id = e.n_id
        |GROUP BY e.q_id
        |ORDER BY e.q_id""".stripMargin,
  )
}
