package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 22: diverse-subset selection and sampled counting.
  *
  *  - `sim_diverse_subset`: farthest-first traversal (the 2-approx
  *    k-center algorithm) over the embedding corpus — the
  *    diverse-sample selector a labeling/eval pipeline runs to pick
  *    maximally-spread exemplars instead of near-duplicates. Start
  *    at the min id; each round adds the point whose best similarity
  *    to the chosen set is WORST (ties to the smallest id); the
  *    final row reports the k-center coverage (the worst-covered
  *    point's best similarity). Centers are driver-fit literals
  *    (bounded at 4), so each round is one corpus scan — the same
  *    contract as the IVF/PQ codebook fits.
  *  - `tok_count_sampled`: the sampled estimator discipline — exact
  *    corpus token count next to a 1/16 deterministic-hash document
  *    sample extrapolated ×16, with the signed error in ppm. At
  *    100 TB the sampled scan is what answers "how many tokens do
  *    we have" in minutes; the ride-along exact count (affordable
  *    at test SF) is what certifies the estimator unbiased.
  *
  * 100 TB shapes: farthest-first is k scans with a 1-row argmin
  * reduce each (no shuffle beyond the agg); the sampled count
  * prunes 15/16 of documents BEFORE tokenization — the filter is
  * on a hash of the partition-pruned id column.
  */
object Ext59Queries {

  // ---------------------------------------------------------------
  // sim_diverse_subset
  // ---------------------------------------------------------------

  private val KCenters = 4

  def diverseSubset(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", Similarity.norm(col("embedding"))).cache()
    val c0 = e.agg(min("vec_id")).collect()(0).getLong(0)
    var centers = Seq(c0)
    val picks = scala.collection.mutable.Buffer[(Long, Long, Long)]()
    def simToCenters(): DataFrame = {
      val centRows = e.filter(col("vec_id").isInCollection(centers))
        .select("vec_id", "embedding", "nrm").collect()
      val centLit = typedlit(centRows.map(r =>
        (r.getLong(0), r.getSeq[Float](1), r.getDouble(2))).toSeq)
      e.withColumn("best_sim_micro", array_max(transform(centLit,
          c => round(Similarity.dotD(col("embedding"),
            c.getField("_2")) / (col("nrm") * c.getField("_3")) * 1000000)
            .cast("long"))))
        .select(col("vec_id"), col("best_sim_micro"))
        .filter(!col("vec_id").isInCollection(centers))
    }
    for (k <- 1 until KCenters) {
      val next = simToCenters()
        .orderBy(col("best_sim_micro"), col("vec_id")).limit(1)
        .collect()(0)
      picks += ((k.toLong, next.getLong(0), next.getLong(1)))
      centers = centers :+ next.getLong(0)
    }
    val cover = simToCenters()
      .orderBy(col("best_sim_micro"), col("vec_id")).limit(1)
      .collect()(0)
    import spark.implicits._
    (Seq((0L, c0, 1000000L)) ++ picks.toSeq ++
      Seq((9L, cover.getLong(0), cover.getLong(1))))
      .toDF("pick_order", "center_id", "worst_sim_micro")
      .orderBy("pick_order")
  }

  // ---------------------------------------------------------------
  // tok_count_sampled
  // ---------------------------------------------------------------

  def tokCountSampled(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("ntok"))
    val keep = conv(substring(md5(concat(lit("tc:"),
      col("doc_id").cast("string"))), 1, 2), 16, 10)
      .cast("long") % 16 === 0
    val exact = docs.agg(count(lit(1)).as("n_docs"),
      sum("ntok").as("exact_tokens"))
    val sampled = docs.filter(keep)
      .agg(count(lit(1)).as("n_sampled"),
        (sum("ntok") * 16).as("est_tokens"))
    exact.crossJoin(sampled)
      // signed error -> pmod-floor division on both engines
      .withColumn("d", expr("(est_tokens - exact_tokens) * 1000000"))
      .withColumn("err_ppm",
        expr("(d - pmod(d, exact_tokens)) div exact_tokens"))
      .select("n_docs", "exact_tokens", "n_sampled", "est_tokens",
        "err_ppm")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_diverse_subset" -> diverseSubset _,
    "tok_count_sampled" -> tokCountSampled _,
  )

  /** Pairwise-sim machinery reused per round; centers resolve from
    * the previous rounds' 1-row CTEs.
    */
  private val simBase: String =
    """WITH ee AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
      |), c0 AS (SELECT MIN(vec_id) AS cid FROM embeddings)""".stripMargin

  /** best-sim-to-centers for every non-center point, centers = the
    * union of c0..c{k-1} 1-row CTEs.
    */
  private def bestSimCte(k: Int): String = {
    val centerUnion = (0 until k).map(i => s"SELECT cid FROM c$i")
      .mkString(" UNION ALL ")
    s""", best$k AS (
       |  SELECT d.vec_id,
       |    MAX(CAST(ROUND(d.dotv / (na.nrm * nc.nrm) * 1000000)
       |      AS BIGINT)) AS bsm
       |  FROM (
       |    SELECT e1.vec_id, c.cid,
       |      SUM(e1.x * e2.x) AS dotv
       |    FROM ($centerUnion) c
       |    JOIN ee e2 ON e2.vec_id = c.cid
       |    JOIN ee e1 ON e1.i = e2.i
       |    GROUP BY e1.vec_id, c.cid
       |  ) d
       |  JOIN norms na ON na.vec_id = d.vec_id
       |  JOIN norms nc ON nc.vec_id = d.cid
       |  WHERE d.vec_id NOT IN ($centerUnion)
       |  GROUP BY d.vec_id
       |), c$k AS (
       |  SELECT vec_id AS cid FROM best$k
       |  ORDER BY bsm, vec_id LIMIT 1
       |)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "sim_diverse_subset" ->
      (simBase + (1 until KCenters).map(bestSimCte).mkString +
        s""", bestCover AS (
        |  SELECT d.vec_id,
        |    MAX(CAST(ROUND(d.dotv / (na.nrm * nc.nrm) * 1000000)
        |      AS BIGINT)) AS bsm
        |  FROM (
        |    SELECT e1.vec_id, c.cid, SUM(e1.x * e2.x) AS dotv
        |    FROM (SELECT cid FROM c0 UNION ALL SELECT cid FROM c1
        |      UNION ALL SELECT cid FROM c2
        |      UNION ALL SELECT cid FROM c3) c
        |    JOIN ee e2 ON e2.vec_id = c.cid
        |    JOIN ee e1 ON e1.i = e2.i
        |    GROUP BY e1.vec_id, c.cid
        |  ) d
        |  JOIN norms na ON na.vec_id = d.vec_id
        |  JOIN norms nc ON nc.vec_id = d.cid
        |  WHERE d.vec_id NOT IN (SELECT cid FROM c0
        |    UNION ALL SELECT cid FROM c1
        |    UNION ALL SELECT cid FROM c2
        |    UNION ALL SELECT cid FROM c3)
        |  GROUP BY d.vec_id
        |)
        |SELECT CAST(0 AS BIGINT) AS pick_order, c0.cid AS center_id,
        |  CAST(1000000 AS BIGINT) AS worst_sim_micro FROM c0
        |UNION ALL SELECT 1, c1.cid,
        |  (SELECT bsm FROM best1 b WHERE b.vec_id = c1.cid) FROM c1
        |UNION ALL SELECT 2, c2.cid,
        |  (SELECT bsm FROM best2 b WHERE b.vec_id = c2.cid) FROM c2
        |UNION ALL SELECT 3, c3.cid,
        |  (SELECT bsm FROM best3 b WHERE b.vec_id = c3.cid) FROM c3
        |UNION ALL SELECT 9, v.vec_id, v.bsm FROM (
        |  SELECT vec_id, bsm FROM bestCover
        |  ORDER BY bsm, vec_id LIMIT 1) v
        |ORDER BY pick_order""".stripMargin),
    "tok_count_sampled" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS ntok,
        |    CAST(('0x' || substr(md5('tc:' || CAST(doc_id AS VARCHAR)),
        |      1, 2))::UBIGINT AS BIGINT) % 16 AS bucket
        |  FROM documents
        |), exact AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(ntok) AS BIGINT) AS exact_tokens
        |  FROM toks
        |), sampled AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sampled,
        |    CAST(SUM(ntok) * 16 AS BIGINT) AS est_tokens
        |  FROM toks WHERE bucket = 0
        |)
        |SELECT e.n_docs, e.exact_tokens, s.n_sampled, s.est_tokens,
        |  CAST(((s.est_tokens - e.exact_tokens) * 1000000
        |    - ((((s.est_tokens - e.exact_tokens) * 1000000)
        |        % e.exact_tokens) + e.exact_tokens) % e.exact_tokens)
        |    // e.exact_tokens AS BIGINT) AS err_ppm
        |FROM exact e CROSS JOIN sampled s""".stripMargin,
  )
}
