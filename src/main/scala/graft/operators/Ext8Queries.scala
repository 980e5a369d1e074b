package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch: corpus-curation operators a training-data pipeline
  * runs between quality scoring and export — weight-proportional
  * sampling and small-file compaction planning. Both are single-window
  * or single-aggregate shapes with no driver-side step, and both are
  * hash-exact against a DuckDB oracle.
  */
object Ext8Queries {

  /** Sample size per language stratum. */
  private val SampleK = 24

  /** Target output-file size (chars) for the compaction planner. */
  private val BinTarget = 4096L

  /** 2^60 as an exact double (power of two — no rounding). */
  private val Pow60 = 1152921504606846976.0

  /** Priority sampling (Duffield–Lund–Thorup, JACM '07): weighted
    * sample of K docs per language with weight = n_chars. Each row
    * gets priority q = w / u with u uniform in (0,1]; the K largest
    * priorities per stratum are the sample, and the (K+1)-th priority
    * tau gives the unbiased Horvitz–Thompson weight max(w, tau).
    *
    * Engine-portable determinism: u comes from a 60-bit md5 prefix of
    * the doc id (no rand()), and every arithmetic step is an IEEE
    * basic op (int→double convert, divide) that Spark and DuckDB
    * round identically — no ln/pow, whose last-ulp behavior differs
    * across libm builds (the exponential-sort formulation u^(1/w)
    * would not be hash-exact).
    *
    * 100 TB shape: one narrow projection + one per-stratum window.
    * The window's per-partition sort is the only per-stratum cost;
    * with bounded strata (languages) it is a top-K heap candidate for
    * AQE, and the rank filter cuts the output to K rows per stratum
    * before anything wide runs. Re-running on a re-partitioned corpus
    * selects exactly the same rows.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u60 = conv(substring(md5(concat(lit("ws:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val u = (u60 + lit(1L)).cast("double") / lit(Pow60)
    val wRank = Window.partitionBy("lang")
      .orderBy(col("prio").desc, col("doc_id"))
    val wLang = Window.partitionBy("lang")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        col("n_chars").as("weight"),
        (col("n_chars").cast("double") / u).as("prio"))
      .withColumn("smp_rank", row_number().over(wRank))
      .withColumn("tau",
        max(when(col("smp_rank") === SampleK + 1, col("prio")))
          .over(wLang))
      .filter(col("smp_rank") <= SampleK)
      .select(col("lang"), col("doc_id"), col("weight"),
        col("smp_rank"),
        round(greatest(col("weight").cast("double"),
          coalesce(col("tau"), col("weight").cast("double"))), 6)
          .as("est_w"))
      .orderBy("lang", "smp_rank")
  }

  /** Small-file compaction planner: assign documents to target-size
    * output files (per-language partitions) by running-sum bin
    * packing — file_id = floor(bytes-before-this-doc / target) in
    * doc_id order, so a file closes once the docs before it fill the
    * target (the classic next-fit plan; a file overshoots by at most
    * one document). Emits the per-file manifest a compactor would
    * execute: doc range, doc count, bytes.
    *
    * 100 TB shape: this IS the small-files fix, not a victim of it —
    * one window (running sum, partitioned by the layout key) + one
    * aggregate, all-integer arithmetic, no driver-side planning. The
    * doc-range output means the compactor can execute each file as an
    * independent range scan.
    */
  def binpack(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("cum_before",
        coalesce(sum("n_chars").over(wCum), lit(0L)))
      .withColumn("file_id", expr(s"cum_before div $BinTarget"))
      .groupBy("lang", "file_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("file_chars"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "file_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_weighted_sample" -> weightedSample _,
    "layout_binpack" -> binpack _,
  )

  def oracle: Map[String, String] = Map(
    "text_weighted_sample" ->
      s"""WITH hx AS (
        |  SELECT doc_id, lang, n_chars,
        |    md5('ws:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), u AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(SUM(CAST(strpos('0123456789abcdef',
        |          substr(h, CAST(i AS INT) + 1, 1)) - 1 AS BIGINT)
        |        << CAST(4 * (14 - i) AS INT)) AS BIGINT) AS u60
        |  FROM hx, UNNEST(range(0, 15)) AS r(i)
        |  GROUP BY doc_id, lang, n_chars, h
        |), pr AS (
        |  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
        |    CAST(n_chars AS DOUBLE)
        |      / ((CAST(u60 + 1 AS DOUBLE)) / 1152921504606846976.0)
        |      AS prio
        |  FROM u
        |), rk AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY lang ORDER BY prio DESC, doc_id) AS INT)
        |    AS smp_rank
        |  FROM pr
        |), tau AS (
        |  SELECT lang,
        |    MAX(CASE WHEN smp_rank = ${SampleK + 1} THEN prio END)
        |      AS tau
        |  FROM rk GROUP BY lang)
        |SELECT r.lang, r.doc_id, r.weight, r.smp_rank,
        |  ROUND(GREATEST(CAST(r.weight AS DOUBLE),
        |    COALESCE(t.tau, CAST(r.weight AS DOUBLE))), 6) AS est_w
        |FROM rk r JOIN tau t USING (lang)
        |WHERE r.smp_rank <= $SampleK
        |ORDER BY lang, smp_rank""".stripMargin,
    "layout_binpack" ->
      s"""WITH c AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY lang
        |      ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM documents)
        |SELECT lang, cum_before // $BinTarget AS file_id,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS file_chars,
        |  MIN(doc_id) AS first_doc,
        |  MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY lang, file_id""".stripMargin,
  )
}
