package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 8: experiment design and robust metrics.
  *
  *  - `ev_power_analysis`: required sample size per arm for 80%
  *    power / 5% two-sided alpha over an MDE grid (1/2/5/10% of the
  *    observed mean) — n = 2(z_α/2+z_β)²σ²/δ², with σ² from exact
  *    corpus moments. The design report that precedes every
  *    experiment; the z constants are fixed literals so both engines
  *    evaluate the identical closed form.
  *  - `ev_ab_winsorized`: per-arm winsorized means — clamp each
  *    arm's values at its own exact p05/p95 rank boundaries (total
  *    order (value, event_id) — no tie nondeterminism), report raw
  *    vs winsorized means and clamp counts. The robust-metric
  *    counterpart to ev_ab_ttest that every real experiment platform
  *    reports (heavy-tail revenue metrics).
  *
  * 100 TB shapes: power analysis is one conditional-moment aggregate
  * + a 4-row grid; winsorization is one rank window per arm (the
  * same per-arm sort any exact-percentile metric pays — at 100 TB
  * the boundary comes from the stored t-digest/histogram instead,
  * same plan shape minus the sort) + a broadcast 2-boundary join.
  */
object Ext34Queries {

  // ---------------------------------------------------------------
  // ev_power_analysis
  // ---------------------------------------------------------------

  def powerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val m = t(spark, dir, "events")
      .select(expr("cast(round(value * 1000) as bigint)").as("vm"))
      .agg(count(lit(1)).as("n"), sum("vm").as("s"),
        sum(col("vm") * col("vm")).as("q"))
    val grid = Seq(1L, 2L, 5L, 10L)
    val spine = broadcast(spark.range(1)
      .select(explode(array(grid.map(lit): _*)).as("mde_pct")))
    m.crossJoin(spine)
      // sample variance and mean from exact moments — identical
      // expression text in the oracle; z_0.975 + z_0.8 literals
      .withColumn("var_m2", expr(
        "(cast(n as double) * cast(q as double)" +
          " - cast(s as double) * cast(s as double))" +
          " / (cast(n as double) * cast(n - 1 as double))"))
      .withColumn("delta", expr(
        "cast(s as double) / cast(n as double)" +
          " * cast(mde_pct as double) / 100.0"))
      .withColumn("n_per_arm", expr(
        "cast(ceil(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621)" +
          " * var_m2 / (delta * delta)) as bigint)"))
      .select(col("mde_pct"),
        expr("cast(round(delta) as bigint)").as("delta_milli"),
        col("n_per_arm"),
        // is the observed corpus (split in half) already big enough?
        (col("n") >= col("n_per_arm") * 2).as("powered_now"))
      .orderBy("mde_pct")
  }

  // ---------------------------------------------------------------
  // ev_ab_winsorized
  // ---------------------------------------------------------------

  def abWinsorized(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select((col("user_id") % 2).as("grp"), col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val wRank = Window.partitionBy("grp")
      .orderBy(col("vm"), col("event_id"))
    val wN = Window.partitionBy("grp")
    val ranked = ev
      .withColumn("rk", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wN))
    // exact disc boundaries: value at rank ceil(0.05 n) / ceil(0.95 n)
    val bounds = broadcast(ranked
      .filter(col("rk") === expr("cast(ceil(n * 0.05) as bigint)") ||
        col("rk") === expr("cast(ceil(n * 0.95) as bigint)"))
      .groupBy("grp")
      .agg(min("vm").as("lo"), max("vm").as("hi")))
    ev.join(bounds, "grp")
      .withColumn("wvm", least(greatest(col("vm"), col("lo")),
        col("hi")))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum("vm").as("s_raw"),
        sum("wvm").as("s_wins"),
        sum(when(col("vm") < col("lo"), 1L).otherwise(0L))
          .as("n_clamped_lo"),
        sum(when(col("vm") > col("hi"), 1L).otherwise(0L))
          .as("n_clamped_hi"),
        max("lo").as("lo_milli"), max("hi").as("hi_milli"))
      .select(col("grp"), col("n"),
        expr("s_raw div n").as("raw_mean_milli"),
        expr("s_wins div n").as("wins_mean_milli"),
        col("n_clamped_lo"), col("n_clamped_hi"),
        col("lo_milli"), col("hi_milli"))
      .orderBy("grp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_power_analysis" -> powerAnalysis _,
    "ev_ab_winsorized" -> abWinsorized _,
  )

  val oracle: Map[String, String] = Map(
    "ev_power_analysis" ->
      """WITH m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS s,
        |    CAST(sum(CAST(round(value * 1000) AS BIGINT)
        |      * CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS q
        |  FROM events
        |), g AS (SELECT unnest([1, 2, 5, 10]) AS mde_pct
        |), c AS (
        |  SELECT m.*, g.mde_pct,
        |    (cast(n as double) * cast(q as double)
        |      - cast(s as double) * cast(s as double))
        |      / (cast(n as double) * cast(n - 1 as double)) AS var_m2,
        |    cast(s as double) / cast(n as double)
        |      * cast(mde_pct as double) / 100.0 AS delta
        |  FROM m, g)
        |SELECT CAST(mde_pct AS BIGINT) AS mde_pct,
        |  cast(round(delta) as bigint) AS delta_milli,
        |  cast(ceil(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621)
        |    * var_m2 / (delta * delta)) as bigint) AS n_per_arm,
        |  (n >= cast(ceil(2.0 * (1.959964 + 0.841621)
        |    * (1.959964 + 0.841621) * var_m2 / (delta * delta))
        |    as bigint) * 2) AS powered_now
        |FROM c ORDER BY mde_pct""".stripMargin,
    "ev_ab_winsorized" ->
      """WITH ev AS (
        |  SELECT user_id % 2 AS grp, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY grp
        |      ORDER BY vm, event_id) AS rk,
        |    count(*) OVER (PARTITION BY grp) AS n
        |  FROM ev
        |), bounds AS (
        |  SELECT grp, CAST(min(vm) AS BIGINT) AS lo,
        |    CAST(max(vm) AS BIGINT) AS hi
        |  FROM ranked
        |  WHERE rk = CAST(ceil(n * 0.05) AS BIGINT)
        |    OR rk = CAST(ceil(n * 0.95) AS BIGINT)
        |  GROUP BY grp)
        |SELECT e.grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(e.vm) // count(*) AS BIGINT) AS raw_mean_milli,
        |  CAST(sum(least(greatest(e.vm, b.lo), b.hi)) // count(*)
        |    AS BIGINT) AS wins_mean_milli,
        |  CAST(sum(CASE WHEN e.vm < b.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clamped_lo,
        |  CAST(sum(CASE WHEN e.vm > b.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clamped_hi,
        |  CAST(max(b.lo) AS BIGINT) AS lo_milli,
        |  CAST(max(b.hi) AS BIGINT) AS hi_milli
        |FROM ev e JOIN bounds b ON e.grp = b.grp
        |GROUP BY e.grp ORDER BY e.grp""".stripMargin,
  )
}
