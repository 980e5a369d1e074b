package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 5: second-moment IVM, attribution sensitivity, and
  * sequential experiment monitoring.
  *
  *  - `cdc_ivm_moments`: incremental maintenance of the MOMENT
  *    aggregate view (count, sum, sum-of-squares → variance) under a
  *    changelog with retractions — extends the cdc_ivm_agg contract
  *    to second moments, which is what makes incremental
  *    mean/variance/z-score dashboards possible without rescanning
  *    state. Retraction algebra is identical (moments are abelian);
  *    the variance evaluates from exact integer moments in doubles
  *    with identical expression text. IVM == full recompute is the
  *    oracle invariant.
  *  - `ev_attrib_window_curve`: conversion-coverage sensitivity to
  *    the attribution lookback — ONE left-outer planned band join at
  *    the WIDEST window (1800 s), then per-conversion min touch age
  *    and a conditional rollup at 60/300/600/1800 s. The report that
  *    decides what lookback an attribution pipeline should pay for;
  *    four windows for one band-join pass instead of four joins.
  *  - `ev_ab_sequential`: the sequential-monitoring z trajectory for
  *    the `user_id % 2` experiment — per-day cumulative Welch z with
  *    a conservative |z| ≥ 3 always-valid-ish crossing flag and the
  *    first crossing day marked. Day-grain windows over exact
  *    integer cumulative moments (the ev_ab_ttest discipline,
  *    cumulated).
  *
  * 100 TB shapes: moment IVM touches |groups| + 2·|touched-keys|
  * rows (semi-join-pruned state reads, the cdc_ivm_agg contract);
  * the window curve's cost is band occupancy at the widest window —
  * strictly cheaper than one join per window; the sequential monitor
  * collapses to (day × arm) cells before any window.
  */
object Ext31Queries {

  // ---------------------------------------------------------------
  // cdc_ivm_moments
  // ---------------------------------------------------------------

  def ivmMoments(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      round(col("value") * 1000).cast("long").as("vm"),
      (col("event_id") % 7 === 0).as("del"))
    def live(df: DataFrame): DataFrame =
      KeyedMerge.lww(df, Seq("user_id"), "event_id")
        .filter(!col("del"))
    // Two-leg touched-key form: contrib(base,+1) + contrib(base |
    // touched,-1) algebraically equals contrib(base ANTI touched,+1),
    // so the view leg and the retract leg collapse into ONE pass over
    // the base state with an anti-join prune — no `.cache()` of an
    // intermediate (the r5 three-leg form cached the base LWW and was
    // measured 102x warm at sf1 in the driver JVM while probing 1.7 s
    // warm on identical data in a fresh one; removing the cached
    // shared subplan removes the only state the blowup could live
    // in). cdc_ivm_agg keeps the explicit three-leg retract algebra;
    // this query witnesses the fused form of the same contract.
    val touched = ev.filter(col("event_id") % 5 === 4)
      .select("user_id").distinct()
    def contrib(df: DataFrame): DataFrame =
      df.groupBy("event_type")
        .agg(count(lit(1)).as("n_users"),
          sum(col("vm")).as("s_milli"),
          sum(col("vm") * col("vm")).as("q_milli2"))
    contrib(live(ev.filter(col("event_id") % 5 =!= 4))
        .join(touched, Seq("user_id"), "left_anti"))
      .unionByName(contrib(
        live(ev.join(touched, Seq("user_id"), "left_semi"))))
      .groupBy("event_type")
      .agg(sum(col("n_users")).as("n_users"),
        sum(col("s_milli")).as("s_milli"),
        sum(col("q_milli2")).as("q_milli2"))
      .filter(col("n_users") > 0)
      // sample variance from the maintained exact moments — doubles
      // with identical expression text in the oracle; NULL for n < 2
      .withColumn("var_milli2_r3",
        when(col("n_users") < 2, lit(null).cast("double"))
          .otherwise(expr(
            "round((cast(n_users as double) * cast(q_milli2 as double)" +
              " - cast(s_milli as double) * cast(s_milli as double))" +
              " / (cast(n_users as double)" +
              " * cast(n_users - 1 as double)), 3)")))
      .select("event_type", "n_users", "s_milli", "q_milli2",
        "var_milli2_r3")
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // ev_attrib_window_curve
  // ---------------------------------------------------------------

  def attribWindowCurve(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("tsec"))
    val touch = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("tsec").as("rtsec"),
        col("event_id").as("rid"))
    val per = graft.plans.PlannedBandJoin.bandJoin(conv, touch,
        Seq("user_id"), "tsec", "rtsec", before = 1800L, after = 0L,
        payload = Seq("rid", "rtsec"), leftOuter = true)
      .groupBy("conv_id")
      .agg(min(when(col("rid").isNotNull && col("rtsec") < col("tsec"),
        col("tsec") - col("rtsec"))).as("min_age"))
    def covered(w: Long) =
      sum(when(col("min_age").isNotNull && col("min_age") <= w, 1L)
        .otherwise(0L)).as(s"covered_$w")
    val agg = per.agg(count(lit(1)).as("n_conversions"),
      covered(60L), covered(300L), covered(600L), covered(1800L))
    agg.select(col("n_conversions") +:
      Seq(60L, 300L, 600L, 1800L).flatMap(w => Seq(
        col(s"covered_$w"),
        expr(s"covered_$w * 1000000 div n_conversions")
          .as(s"rate_${w}_micro"))): _*)
  }

  // ---------------------------------------------------------------
  // ev_ab_sequential
  // ---------------------------------------------------------------

  def abSequential(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "events")
      .select((col("user_id") % 2).as("grp"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("day")
      .agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("dn_a"),
        sum(when(col("grp") === 0, col("vm")).otherwise(0L)).as("ds_a"),
        sum(when(col("grp") === 0, col("vm") * col("vm"))
          .otherwise(0L)).as("dq_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("dn_b"),
        sum(when(col("grp") === 1, col("vm")).otherwise(0L)).as("ds_b"),
        sum(when(col("grp") === 1, col("vm") * col("vm"))
          .otherwise(0L)).as("dq_b"))
    // bounded domain: `cells` is one row per DAY (horizon-bounded)
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("n_a", sum("dn_a").over(w))
      .withColumn("s_a", sum("ds_a").over(w))
      .withColumn("q_a", sum("dq_a").over(w))
      .withColumn("n_b", sum("dn_b").over(w))
      .withColumn("s_b", sum("ds_b").over(w))
      .withColumn("q_b", sum("dq_b").over(w))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      // Welch z from cumulative exact moments — identical expression
      // text in the oracle (the ev_ab_ttest discipline)
      .withColumn("va", expr(
        "(cast(n_a as double) * cast(q_a as double)" +
          " - cast(s_a as double) * cast(s_a as double))" +
          " / (cast(n_a as double) * cast(n_a - 1 as double))"))
      .withColumn("vb", expr(
        "(cast(n_b as double) * cast(q_b as double)" +
          " - cast(s_b as double) * cast(s_b as double))" +
          " / (cast(n_b as double) * cast(n_b - 1 as double))"))
      .withColumn("z", expr(
        "(cast(s_b as double) / cast(n_b as double)" +
          " - cast(s_a as double) / cast(n_a as double))" +
          " / sqrt(va / cast(n_a as double) + vb / cast(n_b as double))"))
      .withColumn("z_milli",
        expr("cast(round(z * 1000) as bigint)"))
      .withColumn("crossed", abs(col("z_milli")) >= 3000L)
    val firstCross = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum
      .withColumn("n_crossed_so_far",
        sum(when(col("crossed"), 1L).otherwise(0L)).over(firstCross))
      .withColumn("is_first_crossing",
        col("crossed") && col("n_crossed_so_far") === 1L)
      .select("day", "n_a", "n_b", "z_milli", "crossed",
        "is_first_crossing")
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_ivm_moments" -> ivmMoments _,
    "ev_attrib_window_curve" -> attribWindowCurve _,
    "ev_ab_sequential" -> abSequential _,
  )

  val oracle: Map[String, String] = Map(
    // full recompute of the SAME live view — IVM == full is the check
    "cdc_ivm_moments" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    (event_id % 7 = 0) AS del
        |  FROM events
        |), lww AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |    FROM ev) x WHERE rn = 1 AND NOT del
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(vm) AS BIGINT) AS s_milli,
        |  CAST(sum(vm * vm) AS BIGINT) AS q_milli2,
        |  CASE WHEN count(*) < 2 THEN NULL ELSE
        |    round((cast(count(*) as double) * cast(sum(vm * vm) as double)
        |      - cast(sum(vm) as double) * cast(sum(vm) as double))
        |      / (cast(count(*) as double)
        |      * cast(count(*) - 1 as double)), 3) END AS var_milli2_r3
        |FROM lww GROUP BY event_type
        |HAVING count(*) > 0
        |ORDER BY event_type""".stripMargin,
    "ev_attrib_window_curve" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events
        |), conv AS (
        |  SELECT user_id, event_id AS conv_id, tsec FROM ev
        |  WHERE event_type = 'purchase'
        |), touch AS (
        |  SELECT user_id, tsec AS rtsec FROM ev
        |  WHERE event_type IN ('click', 'view')
        |), per AS (
        |  SELECT c.conv_id,
        |    min(CASE WHEN t.rtsec IS NOT NULL AND t.rtsec < c.tsec
        |      THEN c.tsec - t.rtsec END) AS min_age
        |  FROM conv c LEFT JOIN touch t
        |    ON t.user_id = c.user_id
        |    AND t.rtsec >= c.tsec - 1800 AND t.rtsec <= c.tsec
        |  GROUP BY c.conv_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(CASE WHEN min_age <= 60 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS covered_60,
        |  CAST(sum(CASE WHEN min_age <= 60 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS rate_60_micro,
        |  CAST(sum(CASE WHEN min_age <= 300 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS covered_300,
        |  CAST(sum(CASE WHEN min_age <= 300 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS rate_300_micro,
        |  CAST(sum(CASE WHEN min_age <= 600 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS covered_600,
        |  CAST(sum(CASE WHEN min_age <= 600 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS rate_600_micro,
        |  CAST(sum(CASE WHEN min_age <= 1800 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS covered_1800,
        |  CAST(sum(CASE WHEN min_age <= 1800 THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS rate_1800_micro
        |FROM per""".stripMargin,
    "ev_ab_sequential" ->
      """WITH cells AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dn_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0
        |      THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS ds_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 0
        |      THEN CAST(round(value * 1000) AS BIGINT)
        |        * CAST(round(value * 1000) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS dq_a,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS dn_b,
        |    CAST(sum(CASE WHEN user_id % 2 = 1
        |      THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS ds_b,
        |    CAST(sum(CASE WHEN user_id % 2 = 1
        |      THEN CAST(round(value * 1000) AS BIGINT)
        |        * CAST(round(value * 1000) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS dq_b
        |  FROM events GROUP BY 1
        |), cum0 AS (
        |  SELECT day,
        |    CAST(sum(dn_a) OVER w AS BIGINT) AS n_a,
        |    CAST(sum(ds_a) OVER w AS BIGINT) AS s_a,
        |    CAST(sum(dq_a) OVER w AS BIGINT) AS q_a,
        |    CAST(sum(dn_b) OVER w AS BIGINT) AS n_b,
        |    CAST(sum(ds_b) OVER w AS BIGINT) AS s_b,
        |    CAST(sum(dq_b) OVER w AS BIGINT) AS q_b
        |  FROM cells
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |), zz AS (
        |  SELECT *,
        |    (cast(s_b as double) / cast(n_b as double)
        |      - cast(s_a as double) / cast(n_a as double))
        |      / sqrt(
        |        ((cast(n_a as double) * cast(q_a as double)
        |          - cast(s_a as double) * cast(s_a as double))
        |          / (cast(n_a as double) * cast(n_a - 1 as double)))
        |          / cast(n_a as double)
        |        + ((cast(n_b as double) * cast(q_b as double)
        |          - cast(s_b as double) * cast(s_b as double))
        |          / (cast(n_b as double) * cast(n_b - 1 as double)))
        |          / cast(n_b as double)) AS z
        |  FROM cum0 WHERE n_a >= 2 AND n_b >= 2
        |), zm AS (
        |  SELECT day, n_a, n_b,
        |    CAST(round(z * 1000) AS BIGINT) AS z_milli
        |  FROM zz
        |), fl AS (
        |  SELECT *, (abs(z_milli) >= 3000) AS crossed,
        |    CAST(sum(CASE WHEN abs(z_milli) >= 3000 THEN 1 ELSE 0 END)
        |      OVER (ORDER BY day
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS ncsf
        |  FROM zm)
        |SELECT day, n_a, n_b, z_milli, crossed,
        |  (crossed AND ncsf = 1) AS is_first_crossing
        |FROM fl ORDER BY day""".stripMargin,
  )
}
