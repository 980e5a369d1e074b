package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 2: cohort retention.
  *
  *  - `ev_retention_matrix`: the cohort-retention TRIANGLE — users
  *    bucketed by first-PURCHASE week, each later week's
  *    distinct-purchasing count expressed as an integer-micro share of
  *    the cohort's size. Distinct from `ev_retention` (Ext3Queries:
  *    daily any-event cohort counts, no normalization): weekly
  *    purchase granularity is what shows real churn at every SF, and
  *    the per-cohort share column is what a growth dashboard plots.
  *
  * 100 TB shape: two aggregates collapse |events| to a |weeks|²
  * triangle; cohort sizes ride a |weeks|-row join.
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_retention_matrix" -> retentionMatrix _,
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
  )
}
