package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 batch C:
  *
  *  - `eval_exposure_fairness`: exposure share per label group across
  *    the retrieval top-10 (DCG-discounted), next to each group's
  *    corpus share — the retrieval-fairness audit that says whether
  *    ranking amplifies or suppresses a group beyond its base rate.
  *    The standard "exposure vs relevance" disparity readout of the
  *    fair-ranking literature, on the engine's own exact top-k.
  */
object Ext84Queries {

  /** Exposure per label over the exact cosine top-10 of the 8 probe
    * queries (the `sim_cosine_topk` machinery, k=10): each hit
    * contributes the DCG discount 1/log2(rank+1), quantized ONCE per
    * rank to the micro lattice — a 10-entry data-independent table,
    * so engine parity is structural (ts_spectral_peak's argument).
    * Per label: corpus share vs exposure share in micro, and their
    * difference (skew) — positive skew = the ranking over-exposes
    * the group relative to its corpus base rate.
    *
    * 100 TB shape: the top-k side is the broadcast-probe brute pass
    * the sim family already pays (sampled probe set at scale; LSH/IVF
    * variants swap in); the fairness reduction is two bounded
    * aggregates (≤ |labels| rows) plus 1-row total broadcasts.
    */
  def exposureFairness(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
    val hits = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
      .join(emb.select(col("vec_id").as("n_id"), col("label")), "n_id")
      .withColumn("disc_micro",
        round(lit(1e6) * log(lit(2.0))
          / log(col("rank").cast("double") + 1)).cast("long"))
    val exp = hits.groupBy("label")
      .agg(count(lit(1)).as("n_hits"),
        sum("disc_micro").as("exp_sum"))
    val expTot = exp.agg(sum("exp_sum").as("exp_tot"))
    val corpus = emb.groupBy("label")
      .agg(count(lit(1)).as("n_corpus"))
    val corpusTot = corpus.agg(sum("n_corpus").as("n_tot"))
    corpus
      .join(exp, Seq("label"), "left")
      .na.fill(0L, Seq("n_hits", "exp_sum"))
      .crossJoin(broadcast(corpusTot))
      .crossJoin(broadcast(expTot))
      .withColumn("corpus_share_micro",
        expr("n_corpus * 1000000 div n_tot"))
      .withColumn("exp_share_micro",
        expr("exp_sum * 1000000 div exp_tot"))
      .withColumn("skew_micro",
        expr("exp_share_micro - corpus_share_micro"))
      .select("label", "n_corpus", "corpus_share_micro", "n_hits",
        "exp_share_micro", "skew_micro")
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_exposure_fairness" -> exposureFairness _,
  )

  val oracle: Map[String, String] = Map(
    "eval_exposure_fairness" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x)
        |    AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY ROUND(d.dot / (nq.nrm * ne.nrm), 6) DESC, n_id)
        |      AS rank
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), hits AS (
        |  SELECT r.n_id, r.rank, e.label,
        |    CAST(ROUND(1e6 * ln(2.0) / ln(CAST(r.rank AS DOUBLE) + 1))
        |      AS BIGINT) AS disc_micro
        |  FROM ranked r JOIN embeddings e ON e.vec_id = r.n_id
        |  WHERE r.rank <= 10
        |), exp AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |    CAST(SUM(disc_micro) AS BIGINT) AS exp_sum
        |  FROM hits GROUP BY label
        |), exp_tot AS (
        |  SELECT CAST(SUM(exp_sum) AS BIGINT) AS exp_tot FROM exp
        |), corpus AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_corpus
        |  FROM embeddings GROUP BY label
        |), n_tot AS (
        |  SELECT CAST(SUM(n_corpus) AS BIGINT) AS n_tot FROM corpus)
        |SELECT c.label, c.n_corpus,
        |  (c.n_corpus * 1000000) // t.n_tot AS corpus_share_micro,
        |  COALESCE(x.n_hits, 0) AS n_hits,
        |  (COALESCE(x.exp_sum, 0) * 1000000) // e.exp_tot
        |    AS exp_share_micro,
        |  (COALESCE(x.exp_sum, 0) * 1000000) // e.exp_tot
        |    - (c.n_corpus * 1000000) // t.n_tot AS skew_micro
        |FROM corpus c
        |LEFT JOIN exp x ON x.label = c.label
        |CROSS JOIN n_tot t
        |CROSS JOIN exp_tot e
        |ORDER BY c.label""".stripMargin,
  )
}
