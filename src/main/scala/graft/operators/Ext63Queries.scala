package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 26: exact Kolmogorov–Smirnov and the MAP-typed
  * higher-order surface.
  *
  *  - `dq_ks_test`: the two-sample KS statistic between the value
  *    distributions of the first and second half of the time range —
  *    the binning-free distribution-equality test (`dq_drift` bins;
  *    KS sees every quantile). Exact integers throughout: the ECDF
  *    gap is maximized as |cum1·n2 − cum2·n1| (cross-multiplied, no
  *    division), normalized once at the end to micro units. The
  *    argmax support point is reported for drill-down.
  *  - `q85_map_functions`: Spark's MAP-typed higher-order lane —
  *    `map_from_entries` → `transform_values` → `map_filter` →
  *    `aggregate(map_values(...))` — exercised per user and then
  *    collapsed to scalar columns. The oracle computes the same
  *    answer relationally, proving the map pipeline is
  *    semantics-preserving (maps as physical detail, not meaning).
  *
  * 100 TB shapes: KS is one (value) pre-aggregate then a window
  * over the value SUPPORT (domain-bounded, not row-bounded); the
  * map lane is a per-user aggregate with map-side combine and
  * row-local map ops — no extra shuffle.
  */
object Ext63Queries {

  // ---------------------------------------------------------------
  // dq_ks_test
  // ---------------------------------------------------------------

  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val cut = broadcast(ev.agg(
      expr("(min(day) + max(day)) div 2").as("mid")))
    val sided = ev.crossJoin(cut)
      .select(col("vm"), when(col("day") <= col("mid"), 1L)
        .otherwise(0L).as("s1"))
    val support = sided.groupBy("vm")
      .agg(sum("s1").as("c1"), sum(lit(1L) - col("s1")).as("c2"))
    // bounded domain: `support` is one row per DISTINCT vm — the
    // 1e-3-quantized value lattice (value-range-bounded, not corpus-
    // sized), so the global CDF window is safe at any SF
    val wv = Window.orderBy("vm")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = support
      .withColumn("cum1", sum("c1").over(wv))
      .withColumn("cum2", sum("c2").over(wv))
      .withColumn("n1", sum("c1").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("n2", sum("c2").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("gap", abs(col("cum1") * col("n2")
        - col("cum2") * col("n1")))
    cums.orderBy(col("gap").desc, col("vm")).limit(1)
      .select(col("n1"), col("n2"), col("vm").as("argmax_vm"),
        col("gap").as("d_scaled"),
        expr("gap * 1000000 div (n1 * n2)").as("d_micro"))
  }

  // ---------------------------------------------------------------
  // q85_map_functions
  // ---------------------------------------------------------------

  def mapFunctions(spark: SparkSession, dir: String): DataFrame = {
    val perType = t(spark, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
    perType.groupBy("user_id")
      .agg(map_from_entries(collect_list(
        struct(col("event_type"), col("n")))).as("m"))
      // the map lane: scale values, drop small entries, fold back
      .withColumn("m1000", transform_values(col("m"),
        (_, v) => v * 1000))
      .withColumn("mbig", map_filter(col("m1000"),
        (_, v) => v >= 5000))
      .select(col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        aggregate(map_values(col("m")), lit(0L), _ + _).as("n_events"),
        size(col("mbig")).cast("long").as("n_big_types"),
        aggregate(map_values(col("mbig")), lit(0L), _ + _)
          .as("big_milli"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_ks_test" -> ksTest _,
    "q85_map_functions" -> mapFunctions _,
  )

  val oracle: Map[String, String] = Map(
    "dq_ks_test" ->
      """WITH ev AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), cut AS (
        |  SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM ev
        |), support AS (
        |  SELECT vm,
        |    CAST(SUM(CASE WHEN day <= cut.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN day <= cut.mid THEN 0 ELSE 1 END)
        |      AS BIGINT) AS c2
        |  FROM ev CROSS JOIN cut GROUP BY vm
        |), cums AS (
        |  SELECT vm,
        |    CAST(SUM(c1) OVER (ORDER BY vm ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
        |    CAST(SUM(c2) OVER (ORDER BY vm ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
        |    CAST(SUM(c1) OVER () AS BIGINT) AS n1,
        |    CAST(SUM(c2) OVER () AS BIGINT) AS n2
        |  FROM support
        |), gaps AS (
        |  SELECT n1, n2, vm AS argmax_vm,
        |    abs(cum1 * n2 - cum2 * n1) AS d_scaled
        |  FROM cums
        |)
        |SELECT n1, n2, argmax_vm, d_scaled,
        |  CAST(d_scaled * 1000000 // (n1 * n2) AS BIGINT) AS d_micro
        |FROM gaps ORDER BY d_scaled DESC, argmax_vm LIMIT 1""".stripMargin,
    "q85_map_functions" ->
      """WITH pt AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id, event_type
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(SUM(n) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN n * 1000 >= 5000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_big_types,
        |  CAST(SUM(CASE WHEN n * 1000 >= 5000 THEN n * 1000 ELSE 0 END)
        |    AS BIGINT) AS big_milli
        |FROM pt GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
