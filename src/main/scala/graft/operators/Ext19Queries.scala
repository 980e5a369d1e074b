package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 5: forecast backtesting and behavioral data quality.
  *
  *  - `ts_backtest_snaive`: the seasonal-naive (lag-7) forecast
  *    backtest — the baseline every production forecast must beat,
  *    and the query that measures it: per event_type, MAE / mean-MAPE
  *    / signed bias of predicting each day with the value a week
  *    earlier. Prediction joins on the (type, day−7) KEY, not a
  *    7-row window lag, so missing days never silently shift the
  *    season.
  *  - `dq_bot_users`: inter-event-gap regularity screening — the
  *    behavioral-bot audit. Per user: exact integer gap moments; a
  *    user is flagged when gap variance < 1 h² over ≥ 5 gaps AND
  *    event count ≥ 10. The variance THRESHOLD comparison is done on
  *    cross-multiplied integers (m·Σg² − (Σg)² < V·m·(m−1)) — no
  *    division, no doubles, no lattice loss.
  *
  * 100 TB shapes: the backtest collapses events to the (type, day)
  * lattice first (one aggregate), then self-joins the bounded daily
  * table on the shifted key; bot screening is one (user)-keyed
  * window for gaps + one aggregate — both shuffles on natural keys,
  * and the flag math is a narrow projection.
  */
object Ext19Queries {

  // ---------------------------------------------------------------
  // ts_backtest_snaive
  // ---------------------------------------------------------------

  def backtestSnaive(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day")
      .agg(sum("vm").as("v_day"))
    val pred = daily.select(col("event_type"),
      (col("day") + 7).as("day"), col("v_day").as("pred"))
    daily.join(pred, Seq("event_type", "day"))
      .withColumn("abs_err", abs(col("v_day") - col("pred")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        expr("sum(abs_err) div count(1)").as("mae_milli"),
        expr("sum(abs_err * 1000000 div v_day) div count(1)")
          .as("mape_mean_micro"),
        sum(col("v_day") - col("pred")).as("bias_sum_milli"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // dq_bot_users
  // ---------------------------------------------------------------

  /** Gap-variance threshold: std < 1 hour (3600 s). */
  private val VarThreshSec2 = 3600L * 3600L

  def botUsers(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("tsec"))
      .withColumn("gap", col("tsec") - lag("tsec", 1).over(w))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(col("gap")).as("m"),
        coalesce(sum("gap"), lit(0L)).as("gap_sum_sec"),
        coalesce(sum(col("gap") * col("gap")), lit(0L)).as("gap_sq_sum"))
      .withColumn("is_regular",
        col("m") >= 5 &&
          (col("m") * col("gap_sq_sum")
            - col("gap_sum_sec") * col("gap_sum_sec"))
            < lit(VarThreshSec2) * col("m") * (col("m") - 1))
      .withColumn("is_bot", col("is_regular") && col("n_events") >= 10)
      .select("user_id", "n_events", "gap_sum_sec", "gap_sq_sum",
        "is_regular", "is_bot")
      .orderBy("user_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_backtest_snaive" -> backtestSnaive _,
    "dq_bot_users" -> botUsers _,
  )

  def oracle: Map[String, String] = Map(
    "ts_backtest_snaive" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_day
        |  FROM events GROUP BY 1, 2
        |), j AS (
        |  SELECT d.event_type, d.day, d.v_day, p.v_day AS pred
        |  FROM daily d
        |  JOIN daily p ON p.event_type = d.event_type
        |    AND p.day = d.day - 7)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(SUM(abs(v_day - pred)) // COUNT(*) AS BIGINT)
        |    AS mae_milli,
        |  CAST(SUM((abs(v_day - pred) * 1000000) // v_day)
        |    // COUNT(*) AS BIGINT) AS mape_mean_micro,
        |  CAST(SUM(v_day - pred) AS BIGINT) AS bias_sum_milli
        |FROM j GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "dq_bot_users" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events
        |), g AS (
        |  SELECT user_id, tsec - lag(tsec) OVER (PARTITION BY user_id
        |    ORDER BY tsec, event_id) AS gap
        |  FROM e
        |), m AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(gap) AS BIGINT) AS m,
        |    CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS gap_sum_sec,
        |    CAST(COALESCE(SUM(gap * gap), 0) AS BIGINT) AS gap_sq_sum
        |  FROM g GROUP BY user_id)
        |SELECT user_id, n_events, gap_sum_sec, gap_sq_sum,
        |  m >= 5 AND m * gap_sq_sum - gap_sum_sec * gap_sum_sec
        |    < ${VarThreshSec2} * m * (m - 1) AS is_regular,
        |  (m >= 5 AND m * gap_sq_sum - gap_sum_sec * gap_sum_sec
        |    < ${VarThreshSec2} * m * (m - 1)) AND n_events >= 10
        |    AS is_bot
        |FROM m
        |ORDER BY user_id""".stripMargin,
  )
}
