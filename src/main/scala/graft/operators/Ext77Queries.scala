package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch E: lagged cross-correlation between two event-type
  * series (the lead/lag diagnostic next to ts_acf's self-correlation)
  * and the AMS inner-product join-size estimate (the sketch a planner
  * consults before choosing a join strategy — the two-stream
  * companion of sketch_ams_f2's self-join size).
  */
object Ext77Queries {

  // ---------------------------------------------------------------
  // ts_xcorr
  // ---------------------------------------------------------------

  /** Cross-correlation of the hourly count series of the
    * lexicographically FIRST vs LAST event types at lags −3..3
    * (negative lag = the second series leads): pairs align by hour
    * index so gaps drop the pair (the ts_acf convention), Pearson r
    * from integer moment sums with one rounded division, NULL when
    * either slice is constant over the overlap.
    *
    * 100 TB shape: the corpus collapses to two |hours|-bounded series
    * in one aggregate; the per-lag joins and moments run on those
    * bounded tables. The 1-row type-pair pick broadcasts.
    */
  def tsXcorr(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hr"),
        col("event_type"))
    val tt = e.agg(min("event_type").as("ta"),
      max("event_type").as("tb"))
    val typed = e.crossJoin(broadcast(tt)).cache() // both slices
    def series(pick: String): DataFrame =
      typed.filter(col("event_type") === col(pick))
        .groupBy("hr").agg(count(lit(1)).as("cnt"))
    val sa = series("ta")
    val sb = series("tb")
    val lagged = (-3 to 3).map { lg =>
      sa.select(col("hr"), col("cnt").as("x"))
        .join(sb.select((col("hr") - lg).as("hr"),
          col("cnt").as("y")), "hr")
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(lit(lg.toLong).as("lag"), col("n"), col("sx"),
          col("sy"), col("sxx"), col("syy"), col("sxy"))
        .filter(col("n") > 0)
    }.reduce(_ unionAll _)
    lagged.withColumn("xcorr_r6", expr(
      """CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
        |THEN NULL
        |ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
        | / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) END"""
        .stripMargin))
      .select("lag", "n", "sx", "sy", "sxx", "syy", "sxy", "xcorr_r6")
      .orderBy("lag")
  }

  // ---------------------------------------------------------------
  // sketch_join_size
  // ---------------------------------------------------------------

  /** AMS inner-product estimate of the user-keyed join size between
    * the even and odd event halves: with the SAME sign family as
    * sketch_ams_f2 (md5 parity of "ams:i:u"), X_i = Σ sign·c_even,
    * Y_i = Σ sign·c_odd, and E[X_i·Y_i] = Σ_u c_even·c_odd — the
    * exact row count of the equi-join. Estimate = lower median of 16
    * products; the exact join size rides as the audit. The sketch is
    * 16 numbers per side, mergeable, and answers the planner's
    * "how big is this join" without touching either table again.
    *
    * 100 TB shape: one per-user conditional aggregate collapses the
    * corpus (in production each half folds its sketch in its own
    * combiner); the 16× expansion and median run on the aggregated
    * user table and 16 rows.
    */
  def sketchJoinSize(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L))
        .as("c1"),
        sum(when(col("event_id") % 2 === 1, 1L).otherwise(0L))
        .as("c2"))
      .cache() // estimators + the exact-join audit share it
    val exact = counts.agg(sum(col("c1") * col("c2"))
      .as("exact_join_rows"))
    val est = counts
      .select(col("user_id"), col("c1"), col("c2"),
        explode(lit((0 until 16).toArray)).as("i"))
      .withColumn("sign", when(
        conv(substring(md5(concat(lit("ams:"), col("i").cast("string"),
          lit(":"), col("user_id").cast("string"))), 1, 1), 16, 10)
          .cast("long") % 2 === 0, 1L).otherwise(-1L))
      .groupBy("i")
      .agg(sum(col("sign") * col("c1")).as("x"),
        sum(col("sign") * col("c2")).as("y"))
      .withColumn("z", col("x") * col("y"))
    // 16 rows by construction — bounded-domain global window
    val ranked = est.withColumn("rn",
      row_number().over(Window.orderBy(col("z"), col("i"))))
    ranked.agg(
        max(when(col("rn") === 8, col("z"))).as("est_median"),
        min("z").as("est_min"), max("z").as("est_max"))
      .crossJoin(broadcast(exact))
      .withColumn("k", lit(16L))
      .withColumn("rel_err_abs_micro", expr(
        "abs(est_median - exact_join_rows) * 1000000" +
          " div greatest(exact_join_rows, 1)"))
      .select("k", "est_median", "est_min", "est_max",
        "exact_join_rows", "rel_err_abs_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_xcorr" -> tsXcorr _,
    "sketch_join_size" -> sketchJoinSize _,
  )

  val oracle: Map[String, String] = Map(
    "ts_xcorr" ->
      """WITH e AS (
        |  SELECT (epoch_us(ts) // 3600000000) AS hr, event_type
        |  FROM events
        |), tt AS (
        |  SELECT MIN(event_type) AS ta, MAX(event_type) AS tb FROM e
        |), sa AS (
        |  SELECT hr, COUNT(*) AS cnt FROM e, tt
        |  WHERE event_type = ta GROUP BY hr
        |), sb AS (
        |  SELECT hr, COUNT(*) AS cnt FROM e, tt
        |  WHERE event_type = tb GROUP BY hr
        |), lags AS (
        |  SELECT CAST(range AS BIGINT) AS lag FROM range(-3, 4)
        |), p AS (
        |  SELECT l.lag, a.cnt AS x, b.cnt AS y
        |  FROM lags l
        |  JOIN sa a ON TRUE
        |  JOIN sb b ON b.hr = a.hr + l.lag)
        |SELECT lag, COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(SUM(x * x) AS BIGINT) AS sxx,
        |  CAST(SUM(y * y) AS BIGINT) AS syy,
        |  CAST(SUM(x * y) AS BIGINT) AS sxy,
        |  CASE WHEN COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) = 0
        |      OR COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) = 0
        |  THEN NULL
        |  ELSE ROUND(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)
        |      AS DOUBLE)
        |    / (sqrt(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
        |        AS DOUBLE))
        |      * sqrt(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)
        |        AS DOUBLE))), 6) END AS xcorr_r6
        |FROM p
        |GROUP BY lag
        |ORDER BY lag""".stripMargin,
    "sketch_join_size" ->
      """WITH counts AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM events GROUP BY user_id
        |), ex AS (
        |  SELECT CAST(SUM(c1 * c2) AS BIGINT) AS exact_join_rows
        |  FROM counts
        |), est AS (
        |  SELECT i,
        |    CAST(SUM(CASE WHEN
        |      substr(md5('ams:' || i || ':' || CAST(user_id AS VARCHAR)),
        |        1, 1) IN ('0','2','4','6','8','a','c','e')
        |      THEN c1 ELSE -c1 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN
        |      substr(md5('ams:' || i || ':' || CAST(user_id AS VARCHAR)),
        |        1, 1) IN ('0','2','4','6','8','a','c','e')
        |      THEN c2 ELSE -c2 END) AS BIGINT) AS y
        |  FROM counts, UNNEST(range(0, 16)) AS ii(i)
        |  GROUP BY i
        |), zs AS (
        |  SELECT i, x * y AS z,
        |    ROW_NUMBER() OVER (ORDER BY x * y, i) AS rn
        |  FROM est)
        |SELECT CAST(16 AS BIGINT) AS k,
        |  CAST(MAX(CASE WHEN rn = 8 THEN z END) AS BIGINT)
        |    AS est_median,
        |  CAST(MIN(z) AS BIGINT) AS est_min,
        |  CAST(MAX(z) AS BIGINT) AS est_max,
        |  MAX(e.exact_join_rows) AS exact_join_rows,
        |  CAST(abs(MAX(CASE WHEN rn = 8 THEN z END)
        |      - MAX(e.exact_join_rows)) * 1000000
        |    // greatest(MAX(e.exact_join_rows), 1) AS BIGINT)
        |    AS rel_err_abs_micro
        |FROM zs, ex e""".stripMargin,
  )
}
