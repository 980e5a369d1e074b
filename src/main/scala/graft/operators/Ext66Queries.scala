package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 1: gap-filled regular series.
  *
  *  - `ts_locf_fill`: last-observation-carried-forward gap fill over a
  *    dense (series, day) spine — the feature-store primitive that
  *    turns an irregular event stream into the regular matrix a model
  *    consumes. Series = (event_type, user_id % 32) so the lattice is
  *    genuinely sparse at every SF; each spine cell reports whether it
  *    was observed, the carried value, and the staleness (days since
  *    the last observation — the freshness SLA a serving layer
  *    monitors). Leading cells before a series' first observation
  *    carry -1 sentinels, never nulls.
  *
  * 100 TB shape: one |events| aggregate down to |series|·|days| cells,
  * a broadcast-able 1-row bounds crossJoin to build the spine, and a
  * per-series window over ≤|days| rows — never a per-event window.
  */
object Ext66Queries {

  def locfFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type").as("t"),
        pmod(col("user_id"), lit(32)).as("g"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .cast("long").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("t", "g", "day").agg(sum("vm").as("v_day"))
    // dense spine: every observed series x the full observed day range
    // (1-row bounds broadcast; the lattice is |series|*|days|, bounded)
    val bounds = daily.agg(min("day").as("mn"), max("day").as("mx"))
    val spine = daily.select("t", "g").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("t"), col("g"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
    val w = Window.partitionBy("t", "g").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("t", "g", "day"), "left")
      .withColumn("v_fill", last(col("v_day"), ignoreNulls = true)
        .over(w))
      .withColumn("obs_day",
        last(when(col("v_day").isNotNull, col("day")),
          ignoreNulls = true).over(w))
      .select(col("t"), col("g"), col("day"),
        when(col("v_day").isNull, lit(1L)).otherwise(lit(0L))
          .as("is_gap"),
        coalesce(col("v_fill"), lit(-1L)).as("v_fill"),
        coalesce(col("day") - col("obs_day"), lit(-1L))
          .as("staleness"))
      .orderBy("t", "g", "day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_locf_fill" -> locfFill _,
  )

  val oracle: Map[String, String] = Map(
    "ts_locf_fill" ->
      """WITH daily AS (
        |  SELECT event_type AS t, user_id % 32 AS g,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_day
        |  FROM events GROUP BY 1, 2, 3
        |), b AS (
        |  SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily
        |), spine AS (
        |  SELECT s.t, s.g, unnest(generate_series(b.mn, b.mx)) AS day
        |  FROM (SELECT DISTINCT t, g FROM daily) s CROSS JOIN b
        |), j AS (
        |  SELECT s.t, s.g, s.day, d.v_day
        |  FROM spine s LEFT JOIN daily d
        |    ON d.t = s.t AND d.g = s.g AND d.day = s.day
        |), f AS (
        |  SELECT t, g, day, v_day,
        |    last_value(v_day IGNORE NULLS) OVER w AS v_fill,
        |    last_value(CASE WHEN v_day IS NOT NULL THEN day END
        |      IGNORE NULLS) OVER w AS obs_day
        |  FROM j
        |  WINDOW w AS (PARTITION BY t, g ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |SELECT t, CAST(g AS BIGINT) AS g, CAST(day AS BIGINT) AS day,
        |  CAST(CASE WHEN v_day IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_gap,
        |  CAST(COALESCE(v_fill, -1) AS BIGINT) AS v_fill,
        |  CAST(COALESCE(day - obs_day, -1) AS BIGINT) AS staleness
        |FROM f ORDER BY t, g, day""".stripMargin,
  )
}
