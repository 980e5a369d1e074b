package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 2: cohort retention and corpus-novelty accounting.
  *
  *  - `ev_retention_matrix`: the classic cohort-retention triangle —
  *    users bucketed by first-PURCHASE week, each later week's
  *    distinct-purchasing count expressed as an integer-micro share of
  *    the cohort's size. The curve every growth dashboard draws; here
  *    it is exact (distinct users, floor division), not sampled.
  *  - `text_ngram_novelty`: per-document contribution to corpus
  *    diversity — of a doc's distinct 3-gram shingles, how many does
  *    it OWN (smallest doc_id among all docs containing the shingle)?
  *    High-novelty docs introduce new n-grams; near-zero novelty means
  *    the doc is assembled from other docs' phrasing — the curation
  *    signal between exact-dup (0 novel) and boilerplate. Built on the
  *    STORED sh3 shingle index (derived:sh3), so the corpus explode is
  *    paid once per corpus, not per query.
  *
  * 100 TB shapes: retention is two aggregates collapsing |events| to a
  * |weeks|² triangle (cohort sizes ride a |weeks|-row join); novelty is
  * one groupBy over the stored shingle table (min owner per shingle)
  * joined back shingle-equi — no doc-pair fan-out anywhere.
  */
object Ext67Queries {

  // ---------------------------------------------------------------
  // ev_retention_matrix
  // ---------------------------------------------------------------

  def retentionMatrix(spark: SparkSession, dir: String): DataFrame = {
    // day >= 0 (data begins 2024-01-01), so `div 7` truncation ==
    // DuckDB `// 7` flooring. Activity = a PURCHASE that week: the
    // retention a revenue dashboard actually tracks, and sparse enough
    // to show real churn at every SF (any-event activity is dense).
    val weekly = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("datediff(timestamp_micros(ts div 1000)," +
          " date'2024-01-01') div 7").cast("long").as("week"))
      .distinct()
    val cohort = weekly.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val m = weekly.join(cohort, Seq("user_id"))
      .select(col("cohort_week"),
        (col("week") - col("cohort_week")).as("age"), col("user_id"))
      .groupBy("cohort_week", "age")
      .agg(count(lit(1)).as("n_active"))
    val sizes = m.filter(col("age") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    m.join(sizes, Seq("cohort_week"))
      .withColumn("retained_micro",
        expr("n_active * 1000000 div cohort_size"))
      .select("cohort_week", "age", "n_active", "cohort_size",
        "retained_micro")
      .orderBy("cohort_week", "age")
  }

  // ---------------------------------------------------------------
  // text_ngram_novelty
  // ---------------------------------------------------------------

  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = NearDupGraph.shingleTable(spark, dir) // (id, shingle)
    val owner = sh.groupBy("shingle").agg(min("id").as("first_id"))
    val per = sh.join(owner, Seq("shingle"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_id") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
    t(spark, dir, "documents").select(col("doc_id"))
      .join(per.withColumnRenamed("id", "doc_id"), Seq("doc_id"),
        "left")
      .na.fill(0L, Seq("n_shingles", "n_novel"))
      .withColumn("novelty_micro",
        when(col("n_shingles") === 0, lit(0L))
          .otherwise(expr("n_novel * 1000000 div n_shingles")))
      .select("doc_id", "n_shingles", "n_novel", "novelty_micro")
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_retention_matrix" -> retentionMatrix _,
    "text_ngram_novelty" -> ngramNovelty _,
  )

  val oracle: Map[String, String] = Map(
    "ev_retention_matrix" ->
      """WITH weekly AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
        |      AS week
        |  FROM events WHERE event_type = 'purchase'
        |), cohort AS (
        |  SELECT user_id, MIN(week) AS cohort_week
        |  FROM weekly GROUP BY user_id
        |), m AS (
        |  SELECT c.cohort_week, w.week - c.cohort_week AS age,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM weekly w JOIN cohort c ON c.user_id = w.user_id
        |  GROUP BY 1, 2
        |), sizes AS (
        |  SELECT cohort_week, n_active AS cohort_size FROM m
        |  WHERE age = 0
        |)
        |SELECT CAST(m.cohort_week AS BIGINT) AS cohort_week,
        |  CAST(m.age AS BIGINT) AS age,
        |  CAST(m.n_active AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(m.n_active * 1000000 // s.cohort_size AS BIGINT)
        |    AS retained_micro
        |FROM m JOIN sizes s ON s.cohort_week = m.cohort_week
        |ORDER BY cohort_week, age""".stripMargin,
    "text_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
        |), own AS (
        |  SELECT shingle, MIN(id) AS first_id FROM sh GROUP BY shingle
        |), per AS (
        |  SELECT s.id, CAST(count(*) AS BIGINT) AS n_shingles,
        |    CAST(SUM(CASE WHEN o.first_id = s.id THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM sh s JOIN own o ON o.shingle = s.shingle
        |  GROUP BY s.id
        |)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_shingles, 0) AS BIGINT) AS n_shingles,
        |  CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
        |  CAST(CASE WHEN COALESCE(p.n_shingles, 0) = 0 THEN 0
        |    ELSE p.n_novel * 1000000 // p.n_shingles END AS BIGINT)
        |    AS novelty_micro
        |FROM documents d LEFT JOIN per p ON p.id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
  )
}
