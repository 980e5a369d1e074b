package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 27: filtered vector search and kNN classification.
  *
  *  - `sim_filtered_ann`: metadata-filtered ANN — the production
  *    problem the plain top-k ladder ignores: "nearest English
  *    documents", where the filter (documents.lang joined on the
  *    vector id) can be applied BEFORE ranking (exact, costs a join
  *    on the full corpus) or AFTER (rank unfiltered top-12, keep
  *    survivors — cheap but lossy). The report carries both: the
  *    pre-filtered exact top-1 and how many of the unfiltered
  *    top-12 survive the filter, plus whether post-filtering would
  *    have found the true answer — the recall-loss audit that
  *    decides which strategy a corpus can afford.
  *  - `eval_knn_classify`: 5-NN majority-vote classification over
  *    the labeled embedding corpus (hash-held-out queries, majority
  *    with smallest-label tiebreak) with per-query verdicts — the
  *    end-to-end usefulness test of the similarity stack: do
  *    neighbors actually share labels?
  *
  * 100 TB shapes: both are broadcast-query passes over the corpus
  * (the sim_cosine_topk contract); the filter join in the pre-filter
  * leg is an equi-join on the vector id that pushes the lang
  * predicate into the documents scan.
  */
object Ext64Queries {

  private def withSim(e: DataFrame, q: DataFrame): DataFrame = e
    .join(broadcast(q), col("cand") =!= col("q_id"))
    .withColumn("sim", round(Similarity.dot(col("qv"), col("cv"))
      / (col("qn") * col("cn")), 6))

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id").as("cand"), col("embedding").as("cv"),
        col("label").cast("long").as("clabel"))
      .withColumn("cn", Similarity.norm(col("cv")))

  private def queriesOf(e: DataFrame, pred: org.apache.spark.sql.Column)
      : DataFrame = e.filter(pred)
    .select(col("cand").as("q_id"), col("cv").as("qv"),
      col("cn").as("qn"), col("clabel").as("qlabel"))

  // ---------------------------------------------------------------
  // sim_filtered_ann
  // ---------------------------------------------------------------

  def filteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir).cache()
    val q = queriesOf(e, col("cand") >= 300 && col("cand") < 308)
    val langs = t(spark, dir, "documents")
      .select(col("doc_id").as("cand"), col("lang"))
    val scored = withSim(e.join(langs, "cand"), q)
      .select("q_id", "cand", "sim", "lang")
    val wQ = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("cand"))
    val pre = scored.filter(col("lang") === "en")
      .withColumn("rk", row_number().over(wQ))
      .filter(col("rk") === 1)
      .select(col("q_id"), col("cand").as("pre1_id"),
        col("sim").as("pre1_sim"))
    val unfiltered = scored
      .withColumn("rk", row_number().over(wQ))
      .filter(col("rk") <= 12)
    val post = unfiltered.groupBy("q_id")
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L))
        .as("n_post_survivors"))
    // both legs derive from `scored` — rename before the self-join
    val hit = unfiltered.select(col("q_id").as("hq"),
        col("cand").as("hcand"))
      .join(pre.select(col("q_id").as("hq2"), col("pre1_id")),
        col("hq") === col("hq2") && col("hcand") === col("pre1_id"))
      .select(col("hq").as("q_id"), lit(1L).as("post_finds_pre1"))
    pre.join(post, "q_id")
      .join(hit, Seq("q_id"), "left")
      .na.fill(0L, Seq("post_finds_pre1"))
      .orderBy("q_id")
      .select("q_id", "pre1_id", "pre1_sim", "n_post_survivors",
        "post_finds_pre1")
  }

  // ---------------------------------------------------------------
  // eval_knn_classify
  // ---------------------------------------------------------------

  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir).cache()
    // hash-held-out query set, BOUNDED: drawn from the fixed id
    // range < 512 so the query side stays a broadcast at every SF
    // (an unbounded held-out fraction would make this pass
    // quadratic in the corpus)
    val held = conv(substring(md5(concat(lit("knn:"),
      col("cand").cast("string"))), 1, 2), 16, 10).cast("long") % 8 === 0
    val q = queriesOf(e, held && col("cand") < 512)
    val wQ = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("cand"))
    val votes = withSim(e, q)
      .withColumn("rk", row_number().over(wQ))
      .filter(col("rk") <= 5)
      .groupBy("q_id", "qlabel", "clabel")
      .agg(count(lit(1)).as("n_votes"))
    val wV = Window.partitionBy("q_id")
      .orderBy(col("n_votes").desc, col("clabel"))
    votes.withColumn("vr", row_number().over(wV))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("qlabel").as("true_label"),
        col("clabel").as("pred_label"),
        when(col("qlabel") === col("clabel"), 1L).otherwise(0L)
          .as("correct"))
      .orderBy("q_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_filtered_ann" -> filteredAnn _,
    "eval_knn_classify" -> knnClassify _,
  )

  private val simsCte: String =
    """WITH ee AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_filtered_ann" ->
      (simsCte + """, q AS (
        |  SELECT vec_id AS q_id FROM embeddings
        |  WHERE vec_id >= 300 AND vec_id < 308
        |), sims AS (
        |  SELECT q.q_id, e2.vec_id AS cand, d.lang,
        |    ROUND(SUM(eq.x * e2.x) / (nq.nrm * n2.nrm), 6) AS sim
        |  FROM q
        |  JOIN ee eq ON eq.vec_id = q.q_id
        |  JOIN ee e2 ON e2.i = eq.i AND e2.vec_id <> q.q_id
        |  JOIN documents d ON d.doc_id = e2.vec_id
        |  JOIN norms nq ON nq.vec_id = q.q_id
        |  JOIN norms n2 ON n2.vec_id = e2.vec_id
        |  GROUP BY q.q_id, e2.vec_id, d.lang, nq.nrm, n2.nrm
        |), pre AS (
        |  SELECT q_id, cand AS pre1_id, sim AS pre1_sim FROM (
        |    SELECT q_id, cand, sim, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand) AS rk
        |    FROM sims WHERE lang = 'en') WHERE rk = 1
        |), unf AS (
        |  SELECT q_id, cand, lang FROM (
        |    SELECT q_id, cand, lang, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand) AS rk
        |    FROM sims) WHERE rk <= 12
        |), post AS (
        |  SELECT q_id,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_post_survivors
        |  FROM unf GROUP BY q_id
        |)
        |SELECT p.q_id, p.pre1_id, p.pre1_sim, po.n_post_survivors,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM unf u
        |      WHERE u.q_id = p.q_id AND u.cand = p.pre1_id)
        |    THEN 1 ELSE 0 END AS BIGINT) AS post_finds_pre1
        |FROM pre p JOIN post po ON po.q_id = p.q_id
        |ORDER BY p.q_id""".stripMargin),
    "eval_knn_classify" ->
      (simsCte + """, q AS (
        |  SELECT vec_id AS q_id,
        |    CAST(label AS BIGINT) AS qlabel
        |  FROM embeddings
        |  WHERE CAST(('0x' || substr(md5('knn:'
        |    || CAST(vec_id AS VARCHAR)), 1, 2))::UBIGINT AS BIGINT)
        |    % 8 = 0 AND vec_id < 512
        |), sims AS (
        |  SELECT q.q_id, q.qlabel, e2.vec_id AS cand,
        |    CAST(emb.label AS BIGINT) AS clabel,
        |    ROUND(SUM(eq.x * e2.x) / (nq.nrm * n2.nrm), 6) AS sim
        |  FROM q
        |  JOIN ee eq ON eq.vec_id = q.q_id
        |  JOIN ee e2 ON e2.i = eq.i AND e2.vec_id <> q.q_id
        |  JOIN embeddings emb ON emb.vec_id = e2.vec_id
        |  JOIN norms nq ON nq.vec_id = q.q_id
        |  JOIN norms n2 ON n2.vec_id = e2.vec_id
        |  GROUP BY q.q_id, q.qlabel, e2.vec_id, emb.label, nq.nrm,
        |    n2.nrm
        |), top5 AS (
        |  SELECT q_id, qlabel, clabel FROM (
        |    SELECT q_id, qlabel, clabel, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY sim DESC, cand) AS rk
        |    FROM sims) WHERE rk <= 5
        |), votes AS (
        |  SELECT q_id, qlabel, clabel,
        |    CAST(count(*) AS BIGINT) AS n_votes
        |  FROM top5 GROUP BY q_id, qlabel, clabel
        |)
        |SELECT q_id, qlabel AS true_label, clabel AS pred_label,
        |  CAST(CASE WHEN qlabel = clabel THEN 1 ELSE 0 END AS BIGINT)
        |    AS correct
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY n_votes DESC, clabel) AS vr
        |  FROM votes) WHERE vr = 1
        |ORDER BY q_id""".stripMargin),
  )
}
