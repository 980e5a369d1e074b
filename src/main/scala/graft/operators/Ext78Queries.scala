package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch F: cluster topic labeling (c-TF-IDF over the
  * near-dup components — the "what IS this cluster" readout a dedup
  * review needs) and rank correlation between two document scorers
  * (the ranker-agreement number an eval harness reports before
  * swapping a scoring function).
  */
object Ext78Queries {

  // ---------------------------------------------------------------
  // text_cluster_topics
  // ---------------------------------------------------------------

  /** c-TF-IDF topic terms per simhash near-dup cluster: treat each
    * connected component as one class, score every term by
    * class-term-frequency × ln(N_docs / df) (df over the WHOLE
    * corpus, so cluster-specific vocabulary outranks corpus-wide
    * stopwords), keep the top 3 per cluster under a total order —
    * the BERTopic-style labeling step that turns an opaque dedup
    * cluster into something a reviewer can read.
    *
    * 100 TB shape: the pair set is the banded simhash search and the
    * labels the shared large-star/small-star loop; term counts are
    * keyed aggregates; the only window partitions by cluster. The
    * 1-row corpus-size broadcast feeds the idf.
    */
  def clusterTopics(spark: SparkSession, dir: String): DataFrame = {
    // stored simhash component labeling (round 12): shared with
    // dedup_cluster_medoid via NearDupGraph — see simhashCcLabels
    val labels = NearDupGraph.simhashCcLabels(spark, dir)
      .select(col("id").as("doc_id"), col("cluster"))
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok0"))
      .select(col("doc_id"), lower(col("tok0")).as("tok"))
      .cache() // cluster-term counts + corpus df share it
    // no broadcast hint: labels is one row per doc in ANY near-dup
    // cluster — a corpus-fraction-sized side at web scale, not a
    // broadcastable one. A key-hash shuffle join (or whatever AQE
    // picks at runtime) is the scale-safe default.
    val ctf = toks.join(labels, "doc_id")
      .groupBy("cluster", "tok").agg(count(lit(1)).as("ctf"))
    val dfreq = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = t(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    val scored = ctf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_micro", expr(
        """cast(round(ctf * ln(cast(n_docs as double)
          |  / cast(df as double)) * 1000000) as bigint)"""
          .stripMargin))
    val w = Window.partitionBy("cluster")
      .orderBy(col("score_micro").desc, col("tok"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("cluster"), col("rank"), col("tok").as("term"),
        col("ctf"), col("df"), col("score_micro"))
      .orderBy("cluster", "rank")
  }

  // ---------------------------------------------------------------
  // eval_rank_correlation
  // ---------------------------------------------------------------

  /** Spearman rank correlation between two document scorers —
    * character length vs whitespace token count — in the
    * deterministic row-number form (ties broken by doc_id, so the
    * classic 1 − 6Σd²/(n(n²−1)) identity applies exactly): the
    * ranker-agreement score an eval harness reads before swapping a
    * quality model.
    *
    * 100 TB shape: both global rankings run through
    * [[DistRank.globalRowNumber]] (range-shuffle + per-partition rank
    * + broadcast offsets) — no single-partition window anywhere; the
    * final moments are one 1-row aggregate.
    */
  def rankCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").as("s1"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("s2"))
    val r1 = DistRank.globalRowNumber(d, "r1", 32,
      col("s1").desc, col("doc_id"))
    val r2 = DistRank.globalRowNumber(r1, "r2", 32,
      col("s2").desc, col("doc_id"))
    r2.agg(count(lit(1)).as("n_docs"),
        sum((col("r1") - col("r2")) * (col("r1") - col("r2")))
          .as("sum_d2"))
      .withColumn("rho_r6", expr(
        """round(1.0d - 6.0d * cast(sum_d2 as double)
          |  / (cast(n_docs as double)
          |     * (cast(n_docs as double) * cast(n_docs as double)
          |        - 1.0d)), 6)""".stripMargin))
      .select("n_docs", "sum_d2", "rho_r6")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_cluster_topics" -> clusterTopics _,
    "eval_rank_correlation" -> rankCorrelation _,
  )

  val oracle: Map[String, String] = Map(
    "text_cluster_topics" ->
      """WITH RECURSIVE tokrows AS (
        |  SELECT doc_id AS id,
        |    md5(unnest(string_split_regex(trim(text), '\s+'))) AS h
        |  FROM documents
        |), votes AS (
        |  SELECT id, bit,
        |    SUM(CASE WHEN
        |      ((strpos('0123456789abcdef', substr(h, bit // 4 + 1, 1)) - 1)
        |        & (1 << (3 - bit % 4))) > 0 THEN 1 ELSE -1 END) AS v
        |  FROM tokrows, UNNEST(range(0, 60)) AS b(bit)
        |  GROUP BY id, bit
        |), fps AS (
        |  SELECT id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (59 - bit)
        |        ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY id
        |), prs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM fps a JOIN fps b ON a.id < b.id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM prs
        |  UNION SELECT id_b, id_a FROM prs
        |), nodes AS (SELECT DISTINCT a AS id FROM edges),
        |walk(a, b) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b
        |), labels AS (
        |  SELECT a AS doc_id, MIN(b) AS cluster FROM walk GROUP BY a
        |), tk AS (
        |  SELECT doc_id,
        |    lower(unnest(string_split_regex(trim(text), '\s+'))) AS tok
        |  FROM documents
        |), ctf AS (
        |  SELECT l.cluster, t.tok, CAST(COUNT(*) AS BIGINT) AS ctf
        |  FROM tk t JOIN labels l ON l.doc_id = t.doc_id
        |  GROUP BY l.cluster, t.tok
        |), dfreq AS (
        |  SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |  FROM tk GROUP BY tok
        |), nd AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        |), scored AS (
        |  SELECT c.cluster, c.tok, c.ctf, d.df,
        |    CAST(round(c.ctf * ln(CAST(n.n_docs AS DOUBLE)
        |      / CAST(d.df AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS score_micro
        |  FROM ctf c JOIN dfreq d ON d.tok = c.tok, nd n
        |), ranked AS (
        |  SELECT cluster, tok, ctf, df, score_micro,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY score_micro DESC, tok) AS rank
        |  FROM scored)
        |SELECT cluster, CAST(rank AS BIGINT) AS rank, tok AS term,
        |  ctf, df, score_micro
        |FROM ranked WHERE rank <= 3
        |ORDER BY cluster, rank""".stripMargin,
    "eval_rank_correlation" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars AS s1,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS s2
        |  FROM documents
        |), ranked AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY s1 DESC, doc_id) AS r1,
        |    ROW_NUMBER() OVER (ORDER BY s2 DESC, doc_id) AS r2
        |  FROM d)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2,
        |  round(1.0 - 6.0 * CAST(SUM((r1 - r2) * (r1 - r2)) AS DOUBLE)
        |    / (CAST(COUNT(*) AS DOUBLE)
        |       * (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
        |          - 1.0)), 6) AS rho_r6
        |FROM ranked""".stripMargin,
  )
}
