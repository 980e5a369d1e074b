package graft.operators

import graft.Tables
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations (SURVEY.md §2.3 "streaming
  * windows"): tumbling and session windows over the events table. The
  * same expressions run under Structured Streaming with
  * `withWatermark` (exercised in EventTimeSpec); here they are declared
  * as batch queries so the DuckDB oracle can check the window algebra.
  */
object EventTimeQueries {

  /** Tumbling 1-hour window per event type. */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(Tables.eventsTsMicros, "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("sum_vm"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_vm"))
      .orderBy("hour", "event_type")

  /** Sliding 1-hour window advancing every 30 minutes, per event
    * type — each event contributes to exactly two overlapping windows
    * (Spark's window generator explodes the assignment).
    */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        window(Tables.eventsTsMicros, "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1000).cast("long")).as("sum_vm"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"),
        col("sum_vm"))
      .orderBy("w_start", "event_type")

  /** Session windows (30-minute inactivity gap) per user. */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(Tables.eventsTsMicros, "30 minutes")
        .as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n"))
      .orderBy("user_id", "session_start")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_window_tumbling" -> tumbling _,
    "ev_window_sliding" -> sliding _,
    "ev_window_session" -> sessions _,
  )

  val oracle: Map[String, String] = Map(
    "ev_window_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*1000) AS BIGINT)) AS BIGINT) AS sum_vm
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,
    // sliding-window replica: the 30-min floor of ts (hour trunc + 30
    // if past half-hour) is one window start; the other is 30 min
    // earlier. Pure TIMESTAMP arithmetic — no epoch/TZ conversions.
    "ev_window_sliding" ->
      """WITH f AS (
        |  SELECT event_type, value,
        |    date_trunc('hour', ts) + CASE WHEN minute(ts) >= 30
        |      THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END AS fl
        |  FROM events
        |), w AS (
        |  SELECT event_type, value,
        |    unnest([fl, fl - INTERVAL 30 MINUTE]) AS w_start
        |  FROM f)
        |SELECT w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value*1000) AS BIGINT)) AS BIGINT) AS sum_vm
        |FROM w GROUP BY w_start, event_type
        |ORDER BY w_start, event_type""".stripMargin,
    // gaps-and-islands replica of session_window semantics: a gap of
    // exactly the threshold starts a NEW session (half-open windows)
    "ev_window_session" ->
      """WITH d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events
        |), s AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
