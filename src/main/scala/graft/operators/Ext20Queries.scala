package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 6: cohort economics and packing observability.
  *
  *  - `ev_cohort_ltv`: cohort lifetime-value curves — users grouped
  *    by first-active day, per-offset activity and value, cumulative
  *    LTV per cohort member on the micro lattice. The standard
  *    growth-analytics surface over the same cohort definition as
  *    `ev_retention`.
  *  - `tok_packing_report`: per-bin audit of `text_pack_sequences` —
  *    explodes each document onto the bins it spans and proves the
  *    prefix-sum packing is TIGHT: every interior bin carries exactly
  *    `budget` tokens (the report is the proof; fragmentation would
  *    show as under-filled interior bins). Also counts boundary-
  *    crossing documents per bin — the attention-mask cost a trainer
  *    cares about.
  *
  * 100 TB shapes: cohort LTV is two user-keyed aggregates + windows
  * on the bounded (cohort × offset) lattice; the packing report
  * explodes each doc to its spanned bins (fan-out = doc's bin count,
  * bounded by doc length div budget + 1) and aggregates on bin id —
  * one shuffle, bin-bounded output.
  */
object Ext20Queries {

  // ---------------------------------------------------------------
  // ev_cohort_ltv
  // ---------------------------------------------------------------

  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "events").select(col("user_id"),
      expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
        .as("day"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
    val cohort = d.groupBy("user_id").agg(min("day").as("cohort_day"))
    val sizes = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_n"))
    val w = Window.partitionBy("cohort_day").orderBy("offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.join(cohort, Seq("user_id"))
      .withColumn("offset", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "offset")
      .agg(sum("vm").as("v_milli"),
        countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("cum_milli", sum("v_milli").over(w))
      .withColumn("ltv_per_user_micro",
        expr("cum_milli * 1000 div cohort_n"))
      .select("cohort_day", "offset", "n_active", "cohort_n",
        "v_milli", "cum_milli", "ltv_per_user_micro")
      .orderBy("cohort_day", "offset")
  }

  // ---------------------------------------------------------------
  // tok_packing_report
  // ---------------------------------------------------------------

  private val Budget = 256L

  def packingReport(spark: SparkSession, dir: String): DataFrame = {
    val packed = TextAnalysis.packSequences(
      t(spark, dir, "documents"), "doc_id", "text", budget = 256)
    packed
      .withColumn("eff", greatest(col("n_tokens"), lit(1L)))
      .select(col("doc_id"), col("start_off"), col("eff"),
        col("bin_end"),
        explode(sequence(col("bin_start"), col("bin_end"))).as("bin"))
      .withColumn("tok_in_bin",
        least(lit(Budget) * (col("bin") + 1),
          col("start_off") + col("eff"))
          - greatest(lit(Budget) * col("bin"), col("start_off")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok_in_bin").as("n_tokens"),
        sum(when(col("bin") < col("bin_end"), 1L).otherwise(0L))
          .as("n_spanning"))
      .orderBy("bin")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_cohort_ltv" -> cohortLtv _,
    "tok_packing_report" -> packingReport _,
  )

  def oracle: Map[String, String] = Map(
    "ev_cohort_ltv" ->
      """WITH d AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY 1
        |), sizes AS (
        |  SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
        |  FROM cohort GROUP BY 1
        |), per AS (
        |  SELECT c.cohort_day, d.day - c.cohort_day AS "offset",
        |    CAST(SUM(d.vm) AS BIGINT) AS v_milli,
        |    CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_active
        |  FROM d JOIN cohort c ON c.user_id = d.user_id
        |  GROUP BY 1, 2)
        |SELECT p.cohort_day, p."offset", p.n_active, s.cohort_n,
        |  p.v_milli,
        |  CAST(SUM(p.v_milli) OVER (PARTITION BY p.cohort_day
        |    ORDER BY p."offset"
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_milli,
        |  CAST(SUM(p.v_milli) OVER (PARTITION BY p.cohort_day
        |    ORDER BY p."offset"
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) * 1000 // s.cohort_n AS ltv_per_user_micro
        |FROM per p JOIN sizes s ON s.cohort_day = p.cohort_day
        |ORDER BY p.cohort_day, p."offset"""".stripMargin,
    "tok_packing_report" ->
      """WITH base AS (
        |  SELECT doc_id, md5(text) AS key,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), cum AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS start_off
        |  FROM base
        |), spans AS (
        |  SELECT doc_id, start_off,
        |    greatest(n_tokens, 1) AS eff,
        |    CAST(floor(start_off / 256) AS BIGINT) AS bin_start,
        |    CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 256)
        |      AS BIGINT) AS bin_end
        |  FROM cum
        |), bins AS (
        |  SELECT s.doc_id, s.start_off, s.eff, s.bin_end,
        |    CAST(b.bin AS BIGINT) AS bin
        |  FROM spans s,
        |    UNNEST(generate_series(s.bin_start, s.bin_end)) AS b(bin))
        |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(least(256 * (bin + 1), start_off + eff)
        |    - greatest(256 * bin, start_off)) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN bin < bin_end THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_spanning
        |FROM bins GROUP BY bin
        |ORDER BY bin""".stripMargin,
  )
}
