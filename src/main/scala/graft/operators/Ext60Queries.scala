package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 23: Haar multiresolution analysis and word
  * burstiness.
  *
  *  - `ts_haar_dwt`: the (unnormalized) Haar discrete wavelet
  *    transform of each type's daily-sum series — per level,
  *    approximations are pair sums and details pair differences, so
  *    the whole multiresolution pyramid stays EXACT integer
  *    arithmetic (the multiscale complement of the single-scale
  *    `ts_hadamard_energy`). Reports per (type, level ≤ 3): the
  *    detail count, L1 detail mass, and the largest |detail| — the
  *    burst locator at that time scale.
  *  - `text_word_burstiness`: Church–Gale burstiness — occurrences
  *    per containing document (`n_occ·1e6 div n_docs`) for words
  *    with ≥ 20 occurrences, top-40. Distinguishes topical bursty
  *    words (high occurrences in few docs) from function words that
  *    spread evenly — a signal `text_quality`'s stopword ratios
  *    cannot see.
  *
  * 100 TB shapes: the DWT collapses the corpus to |types|×|days|
  * cells first, then each level halves the (already tiny) series
  * with one groupBy; burstiness is one (word) hash aggregate with
  * map-side combine plus a bounded top-k.
  */
object Ext60Queries {

  private val Day0 = 19723L

  // ---------------------------------------------------------------
  // ts_haar_dwt
  // ---------------------------------------------------------------

  def haarDwt(spark: SparkSession, dir: String): DataFrame = {
    var level = t(spark, dir, "events")
      .select(col("event_type"),
        (expr("cast(ts div 86400000000000 as bigint)") - Day0).as("tt"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .filter(col("tt") >= 0 && col("tt") < 32)
      .groupBy("event_type", "tt")
      .agg(sum("vm").as("v"))
    val reports = (1 to 3).map { lv =>
      val step = level
        .groupBy(col("event_type"), expr("tt div 2").as("j"))
        .agg(sum("v").as("a"),
          sum(when(col("tt") % 2 === 0, col("v"))
            .otherwise(-col("v"))).as("d"))
      val report = step.groupBy("event_type")
        .agg(count(lit(1)).as("n_coeffs"),
          sum(abs(col("d"))).as("l1_detail"),
          max(abs(col("d"))).as("max_abs_detail"))
        .withColumn("level", lit(lv.toLong))
      level = step.select(col("event_type"), col("j").as("tt"),
        col("a").as("v"))
      report
    }
    reports.reduce(_.unionByName(_))
      .select("event_type", "level", "n_coeffs", "l1_detail",
        "max_abs_detail")
      .orderBy("event_type", "level")
  }

  // ---------------------------------------------------------------
  // text_word_burstiness
  // ---------------------------------------------------------------

  def wordBurstiness(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w0"))
      .select(col("doc_id"), lower(col("w0")).as("w"))
      .groupBy("w")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 20)
      .withColumn("burst_micro", expr("n_occ * 1000000 div n_docs"))
      .orderBy(col("burst_micro").desc, col("w"))
      .limit(40)
      .select("w", "n_docs", "n_occ", "burst_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_haar_dwt" -> haarDwt _,
    "text_word_burstiness" -> wordBurstiness _,
  )

  val oracle: Map[String, String] = Map(
    "ts_haar_dwt" ->
      s"""WITH l0 AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 86400000000000 - $Day0 AS tt,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events
        |  WHERE epoch_ns(ts) // 86400000000000 - $Day0 >= 0
        |    AND epoch_ns(ts) // 86400000000000 - $Day0 < 32
        |  GROUP BY 1, 2
        |), s1 AS (
        |  SELECT event_type, tt // 2 AS j, SUM(v) AS a,
        |    SUM(CASE WHEN tt % 2 = 0 THEN v ELSE -v END) AS d
        |  FROM l0 GROUP BY 1, 2
        |), s2 AS (
        |  SELECT event_type, j // 2 AS j, SUM(a) AS a,
        |    SUM(CASE WHEN j % 2 = 0 THEN a ELSE -a END) AS d
        |  FROM s1 GROUP BY 1, 2
        |), s3 AS (
        |  SELECT event_type, j // 2 AS j, SUM(a) AS a,
        |    SUM(CASE WHEN j % 2 = 0 THEN a ELSE -a END) AS d
        |  FROM s2 GROUP BY 1, 2
        |), rep AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS level,
        |    CAST(count(*) AS BIGINT) AS n_coeffs,
        |    CAST(SUM(abs(d)) AS BIGINT) AS l1_detail,
        |    CAST(MAX(abs(d)) AS BIGINT) AS max_abs_detail
        |  FROM s1 GROUP BY event_type
        |  UNION ALL
        |  SELECT event_type, 2, CAST(count(*) AS BIGINT),
        |    CAST(SUM(abs(d)) AS BIGINT), CAST(MAX(abs(d)) AS BIGINT)
        |  FROM s2 GROUP BY event_type
        |  UNION ALL
        |  SELECT event_type, 3, CAST(count(*) AS BIGINT),
        |    CAST(SUM(abs(d)) AS BIGINT), CAST(MAX(abs(d)) AS BIGINT)
        |  FROM s3 GROUP BY event_type
        |)
        |SELECT event_type, level, n_coeffs, l1_detail, max_abs_detail
        |FROM rep ORDER BY event_type, level""".stripMargin,
    "text_word_burstiness" ->
      """WITH tok AS (
        |  SELECT doc_id, lower(unnest(
        |    string_split_regex(trim(text), '\s+'))) AS w
        |  FROM documents
        |), agg AS (
        |  SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |    CAST(count(*) AS BIGINT) AS n_occ
        |  FROM tok GROUP BY w
        |  HAVING count(*) >= 20
        |)
        |SELECT w, n_docs, n_occ,
        |  CAST(n_occ * 1000000 // n_docs AS BIGINT) AS burst_micro
        |FROM agg
        |ORDER BY burst_micro DESC, w LIMIT 40""".stripMargin,
  )
}
