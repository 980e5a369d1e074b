package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch H: rolling correlation between two event series (the
  * time-local complement of ts_xcorr's whole-series lags) and
  * precision-recall average precision (the imbalanced-data companion
  * of eval_auc's ROC statistic).
  */
object Ext80Queries {

  // ---------------------------------------------------------------
  // ts_rolling_corr
  // ---------------------------------------------------------------

  /** 7-day rolling Pearson correlation between the daily count series
    * of the lexicographically first vs last event types: windowed
    * integer moment sums over a RANGE frame on the day index (gap
    * days shrink the window rather than silently shifting it), one
    * rounded division per day, NULL where either slice is constant —
    * the time-local agreement curve next to ts_xcorr's whole-series
    * lags (a regime change shows here first).
    *
    * 100 TB shape: the corpus collapses to two |days|-bounded series
    * in one aggregate; the rolling window runs over that
    * domain-bounded day table (horizon-bounded — the one global
    * window is over calendar days, never rows).
    */
  def rollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(expr("(ts div 1000) div 86400000000").as("day"),
        col("event_type"))
    val tt = e.agg(min("event_type").as("ta"),
      max("event_type").as("tb"))
    val typed = e.crossJoin(broadcast(tt)).cache() // both slices
    def series(pick: String, out: String): DataFrame =
      typed.filter(col("event_type") === col(pick))
        .groupBy("day").agg(count(lit(1)).as(out))
    val joined = series("ta", "x").join(series("tb", "y"), "day")
    // bounded domain: one row per DAY (horizon-bounded)
    val w = Window.orderBy("day").rangeBetween(-6, 0)
    joined
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sx", sum("x").over(w))
      .withColumn("sy", sum("y").over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .filter(col("n_win") >= 4)
      .withColumn("r_r6", expr(
        """CASE WHEN n_win * sxx - sx * sx = 0
          |  OR n_win * syy - sy * sy = 0 THEN NULL
          |ELSE round(CAST(n_win * sxy - sx * sy AS DOUBLE)
          | / (sqrt(CAST(n_win * sxx - sx * sx AS DOUBLE))
          |    * sqrt(CAST(n_win * syy - sy * sy AS DOUBLE))), 6)
          |END""".stripMargin))
      .select("day", "n_win", "sx", "sy", "sxx", "syy", "sxy", "r_r6")
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // eval_auc_pr
  // ---------------------------------------------------------------

  /** Average precision (area under the precision-recall curve) of the
    * eval_auc scorer, tie-consistent: distinct score levels process
    * as atomic blocks in descending order, each contributing
    * tp(s) · precision-at-the-block-end; every step is integer on
    * fixed lattices (precision in nano, AP = Σ terms div n_pos) so
    * the statistic is BIGINT end-to-end — the imbalanced-data metric
    * ROC AUC famously flatters.
    *
    * 100 TB shape: one (score) aggregate collapses the corpus to the
    * score lattice; the cumulative window runs over that
    * DOMAIN-bounded table (the eval_auc convention); the final
    * reduction is a 1-row aggregate.
    */
  def evalAucPr(spark: SparkSession, dir: String): DataFrame = {
    // bounded domain: one row per distinct score-lattice value
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "embeddings")
      .select(
        expr("cast(round(cast(element_at(embedding, 1) as double)" +
          " * 1000000) as bigint)").as("score"),
        (col("label") % 2 === 0).cast("long").as("pos"))
      .groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("cnt_pos"))
      .withColumn("tp_cum", sum("cnt_pos").over(wCum))
      .withColumn("pred_cum", sum("cnt").over(wCum))
      .withColumn("term_nano",
        expr("cnt_pos * ((tp_cum * 1000000000) div pred_cum)"))
      .agg(sum("cnt_pos").as("n_pos"),
        sum(col("cnt") - col("cnt_pos")).as("n_neg"),
        sum("term_nano").as("term_sum_nano"))
      .withColumn("ap_nano", expr("term_sum_nano div n_pos"))
      .select("n_pos", "n_neg", "term_sum_nano", "ap_nano")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_rolling_corr" -> rollingCorr _,
    "eval_auc_pr" -> evalAucPr _,
  )

  val oracle: Map[String, String] = Map(
    "ts_rolling_corr" ->
      """WITH e AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, event_type
        |  FROM events
        |), tt AS (
        |  SELECT MIN(event_type) AS ta, MAX(event_type) AS tb FROM e
        |), sa AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS x FROM e, tt
        |  WHERE event_type = ta GROUP BY day
        |), sb AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS y FROM e, tt
        |  WHERE event_type = tb GROUP BY day
        |), j AS (
        |  SELECT sa.day, sa.x, sb.y
        |  FROM sa JOIN sb ON sb.day = sa.day
        |), m AS (
        |  SELECT day,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
        |    CAST(SUM(x) OVER w AS BIGINT) AS sx,
        |    CAST(SUM(y) OVER w AS BIGINT) AS sy,
        |    CAST(SUM(x * x) OVER w AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) OVER w AS BIGINT) AS syy,
        |    CAST(SUM(x * y) OVER w AS BIGINT) AS sxy
        |  FROM j
        |  WINDOW w AS (ORDER BY day
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, n_win, sx, sy, sxx, syy, sxy,
        |  CASE WHEN n_win * sxx - sx * sx = 0
        |      OR n_win * syy - sy * sy = 0 THEN NULL
        |  ELSE round(CAST(n_win * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n_win * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n_win * syy - sy * sy AS DOUBLE))), 6)
        |  END AS r_r6
        |FROM m WHERE n_win >= 4
        |ORDER BY day""".stripMargin,
    "eval_auc_pr" ->
      """WITH s AS (
        |  SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
        |      AS BIGINT) AS score,
        |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
        |  FROM embeddings
        |), lev AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(pos) AS BIGINT) AS cnt_pos
        |  FROM s GROUP BY score
        |), cum AS (
        |  SELECT score, cnt, cnt_pos,
        |    CAST(SUM(cnt_pos) OVER w AS BIGINT) AS tp_cum,
        |    CAST(SUM(cnt) OVER w AS BIGINT) AS pred_cum
        |  FROM lev
        |  WINDOW w AS (ORDER BY score DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
        |  CAST(SUM(cnt - cnt_pos) AS BIGINT) AS n_neg,
        |  CAST(SUM(cnt_pos * ((tp_cum * 1000000000) // pred_cum))
        |    AS BIGINT) AS term_sum_nano,
        |  CAST(SUM(cnt_pos * ((tp_cum * 1000000000) // pred_cum))
        |    // SUM(cnt_pos) AS BIGINT) AS ap_nano
        |FROM cum""".stripMargin,
  )
}
