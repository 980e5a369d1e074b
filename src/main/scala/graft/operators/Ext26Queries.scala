package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 12: operational skew and temporal shape reports.
  *
  *  - `cdc_hot_keys`: the hot-key report over the changelog — the
  *    number an operator reads before deciding whether the keyed
  *    merge needs salting (`q24_salted_agg`) or AQE skew splits.
  *    Top-10 keys by message volume via TakeOrderedAndProject (per-
  *    partition heap — no global sort), share against a plan-
  *    embedded 1-row total.
  *  - `ev_dow_hod_matrix`: the day-of-week × hour-of-day activity
  *    matrix (2024-01-01 is a Monday — dow 0) with traffic shares —
  *    the classic ops heatmap; the share window runs on the
  *    ≤ 168-row matrix.
  *
  * 100 TB shapes: hot keys are one hash aggregate + a bounded heap;
  * the matrix is one narrow projection + a 168-cell aggregate —
  * map-side combined, nothing wide.
  */
object Ext26Queries {

  // ---------------------------------------------------------------
  // cdc_hot_keys
  // ---------------------------------------------------------------

  def hotKeys(spark: SparkSession, dir: String): DataFrame = {
    val parsed = CdcQueries.parsedPublic(spark, dir)
      .filter(col("op") =!= CdcParse.OpDrop)
    val counts = parsed.groupBy("user_id")
      .agg(count(lit(1)).as("n_msgs"),
        countDistinct(col("op")).as("n_ops"))
    val total = broadcast(parsed.agg(count(lit(1)).as("total")))
    counts.crossJoin(total)
      .withColumn("share_micro", expr("n_msgs * 1000000 div total"))
      .select("user_id", "n_msgs", "n_ops", "share_micro")
      .orderBy(col("n_msgs").desc, col("user_id"))
      .limit(10)
  }

  // ---------------------------------------------------------------
  // ev_dow_hod_matrix
  // ---------------------------------------------------------------

  def dowHodMatrix(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    t(spark, dir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01') % 7")
          .as("dow"),
        expr("(ts div 1000) % 86400000000 div 3600000000").as("hod"))
      .groupBy("dow", "hod")
      .agg(count(lit(1)).as("n_events"))
      .withColumn("share_micro",
        expr("n_events * 1000000 div sum(n_events) over ()"))
      .orderBy("dow", "hod")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_hot_keys" -> hotKeys _,
    "ev_dow_hod_matrix" -> dowHodMatrix _,
  )

  def oracle: Map[String, String] = Map(
    "cdc_hot_keys" -> (CdcQueries.baseCtePublic +
      """
        |, t2 AS (SELECT * FROM typed WHERE op <> 'drop'),
        |counts AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_msgs,
        |    CAST(COUNT(DISTINCT op) AS BIGINT) AS n_ops
        |  FROM t2 GROUP BY user_id
        |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t2)
        |SELECT user_id, n_msgs, n_ops,
        |  (n_msgs * 1000000) // tot.total AS share_micro
        |FROM counts CROSS JOIN tot
        |ORDER BY n_msgs DESC, user_id
        |LIMIT 10""".stripMargin),
    "ev_dow_hod_matrix" ->
      """WITH e AS (
        |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      % 7 AS dow,
        |    epoch_us(ts) % 86400000000 // 3600000000 AS hod
        |  FROM events
        |), m AS (
        |  SELECT dow, hod, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM e GROUP BY dow, hod)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
        |  n_events,
        |  (n_events * 1000000)
        |    // CAST(SUM(n_events) OVER () AS BIGINT) AS share_micro
        |FROM m ORDER BY dow, hod""".stripMargin,
  )
}
