package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 6: inverse-distribution functions, robust outlier
  * screening, and concentration curves.
  *
  *  - `q77_percentile_disc`: the ANSI inverse-distribution surface —
  *    `percentile_disc(p) WITHIN GROUP (ORDER BY x)` per group.
  *    DISC (not CONT) because it returns an ACTUAL element of the
  *    distribution: exact on the integer lattice in any engine,
  *    where the interpolating form would manufacture doubles
  *    (verified: Spark and DuckDB pick the identical element).
  *  - `dq_iqr_outliers`: the Tukey-fence outlier count per numeric
  *    column — [Q1 − 1.5·IQR, Q3 + 1.5·IQR] with DISC quartiles, so
  *    the fences are exact integers (×2 scaling keeps the 1.5
  *    multiplier on the lattice). The per-column screening report a
  *    DQ gate runs before trusting aggregates.
  *  - `ev_lorenz_curve`: per-decile value concentration (the Lorenz
  *    curve behind ev_gini's scalar): users ranked by total value,
  *    ntile(10), each decile's share and cumulative share. How much
  *    of the metric the top decile owns — the whale report.
  *
  * 100 TB shapes: disc percentiles are one shuffle per group key
  * (Spark's PercentileDisc aggregates without a global sort); the
  * fence count is two passes (quartiles, then a broadcast-fence
  * filter-count); the Lorenz curve shuffles once on user, once on
  * decile (10 cells).
  */
object Ext43Queries {

  // ---------------------------------------------------------------
  // q77_percentile_disc
  // ---------------------------------------------------------------

  def percentileDisc(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(percentile_disc(0.25) WITHIN GROUP
        |    (ORDER BY CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS q1_cents,
        |  CAST(percentile_disc(0.5) WITHIN GROUP
        |    (ORDER BY CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS med_cents,
        |  CAST(percentile_disc(0.75) WITHIN GROUP
        |    (ORDER BY CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS q3_cents
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin)
  }

  // ---------------------------------------------------------------
  // dq_iqr_outliers
  // ---------------------------------------------------------------

  def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(
      round(col("l_quantity") * 100).cast("long").as("quantity_cents"),
      round(col("l_extendedprice") * 100).cast("long").as("price_cents"),
      round(col("l_discount") * 10000).cast("long").as("discount_bp"))
    val cols = Seq("quantity_cents", "price_cents", "discount_bp")
    cols.map { c =>
      val q = li.select(
        expr(s"percentile_disc(0.25) within group (order by $c)")
          .cast("long").as("q1"),
        expr(s"percentile_disc(0.75) within group (order by $c)")
          .cast("long").as("q3"))
      // fences on the ×2 lattice: lo2 = 2·q1 − 3·iqr, hi2 = 2·q3 +
      // 3·iqr (3·iqr = 2 × 1.5·iqr, so the 1.5 never leaves integers)
      li.select(col(c).as("v")).crossJoin(broadcast(q))
        .withColumn("iqr", col("q3") - col("q1"))
        .withColumn("lo2", col("q1") * 2 - col("iqr") * 3)
        .withColumn("hi2", col("q3") * 2 + col("iqr") * 3)
        .agg(
          first(col("q1")).as("q1"),
          first(col("q3")).as("q3"),
          sum(when(col("v") * 2 < col("lo2"), 1L).otherwise(0L))
            .as("n_low"),
          sum(when(col("v") * 2 > col("hi2"), 1L).otherwise(0L))
            .as("n_high"),
          count(lit(1)).as("n_rows"))
        .select(lit(c).as("column"), col("n_rows"), col("q1"),
          col("q3"), col("n_low"), col("n_high"))
    }.reduce(_.unionByName(_)).orderBy("column")
  }

  // ---------------------------------------------------------------
  // ev_lorenz_curve
  // ---------------------------------------------------------------

  def lorenzCurve(spark: SparkSession, dir: String): DataFrame = {
    val per = t(spark, dir, "events")
      .select(col("user_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("user_id").agg(sum("vm").as("v_user"))
    // |users| is corpus-sized: global-window ntile(10) would
    // single-partition it (r7 verdict ask #4) — DistRank rank + the
    // exact NTILE formula, 1-row count broadcast (oracle keeps NTILE)
    val nUsers = per.agg(count(lit(1)).as("_n_users"))
    val d = DistRank.globalRowNumber(per, "_rn", 32,
      col("v_user"), col("user_id"))
      .crossJoin(broadcast(nUsers))
      .withColumn("decile",
        DistRank.ntileFromRowNumber(col("_rn"), col("_n_users"), 10)
          .cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum("v_user").as("v_decile"))
    val tot = broadcast(d.agg(sum("v_decile").as("v_total")))
    d.crossJoin(tot)
      .withColumn("share_micro",
        expr("v_decile * 1000000 div v_total"))
      .withColumn("cum_share_micro",
        expr("sum(v_decile) over (order by decile" +
          " rows between unbounded preceding and current row)" +
          " * 1000000 div v_total"))
      .select("decile", "n_users", "v_decile", "share_micro",
        "cum_share_micro")
      .orderBy("decile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_percentile_disc" -> percentileDisc _,
    "dq_iqr_outliers" -> iqrOutliers _,
    "ev_lorenz_curve" -> lorenzCurve _,
  )

  val oracle: Map[String, String] = Map(
    "q77_percentile_disc" ->
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(quantile_disc(CAST(round(l_quantity * 100) AS BIGINT), 0.25)
        |    AS BIGINT) AS q1_cents,
        |  CAST(quantile_disc(CAST(round(l_quantity * 100) AS BIGINT), 0.5)
        |    AS BIGINT) AS med_cents,
        |  CAST(quantile_disc(CAST(round(l_quantity * 100) AS BIGINT), 0.75)
        |    AS BIGINT) AS q3_cents
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "dq_iqr_outliers" ->
      """WITH li AS (
        |  SELECT CAST(round(l_quantity * 100) AS BIGINT) AS quantity_cents,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |    CAST(round(l_discount * 10000) AS BIGINT) AS discount_bp
        |  FROM lineitem
        |), longf AS (
        |  SELECT 'quantity_cents' AS "column", quantity_cents AS v
        |  FROM li
        |  UNION ALL SELECT 'price_cents', price_cents FROM li
        |  UNION ALL SELECT 'discount_bp', discount_bp FROM li
        |), q AS (
        |  SELECT "column",
        |    CAST(quantile_disc(v, 0.25) AS BIGINT) AS q1,
        |    CAST(quantile_disc(v, 0.75) AS BIGINT) AS q3,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM longf GROUP BY 1)
        |SELECT l."column", q.n_rows, q.q1, q.q3,
        |  CAST(SUM(CASE WHEN l.v * 2 < q.q1 * 2 - (q.q3 - q.q1) * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |  CAST(SUM(CASE WHEN l.v * 2 > q.q3 * 2 + (q.q3 - q.q1) * 3
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM longf l JOIN q ON q."column" = l."column"
        |GROUP BY 1, 2, 3, 4
        |ORDER BY l."column"""".stripMargin,
    "ev_lorenz_curve" ->
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_user
        |  FROM events GROUP BY user_id
        |), d AS (
        |  SELECT ntile(10) OVER (ORDER BY v_user, user_id) AS decile,
        |    v_user
        |  FROM per
        |), agg AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_users,
        |    CAST(SUM(v_user) AS BIGINT) AS v_decile
        |  FROM d GROUP BY decile
        |), tot AS (SELECT CAST(SUM(v_decile) AS BIGINT) AS v_total
        |           FROM agg)
        |SELECT CAST(a.decile AS BIGINT) AS decile, a.n_users,
        |  a.v_decile,
        |  CAST(a.v_decile * 1000000 // t.v_total AS BIGINT)
        |    AS share_micro,
        |  CAST(SUM(a.v_decile) OVER (ORDER BY a.decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    * 1000000 // t.v_total AS BIGINT) AS cum_share_micro
        |FROM agg a, tot t
        |ORDER BY decile""".stripMargin,
  )
}
