package graft.operators

import graft.Tables
import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Additional operator coverage: as-of join, pivot, JSON access, exact
  * percentiles (SURVEY.md §2.3 joins/aggregations/JSON categories).
  */
object MiscQueries {

  /** As-of attribution: each event joined to the user's most recent
    * purchase at-or-before its time (graft.operators.AsOf — union +
    * carry-forward, one shuffle).
    */
  def asofAttrib(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        Tables.eventsTsMicros.as("ts"), col("event_type"),
        round(col("value") * 1000).cast("long").as("vm"))
    // right side deduped per (key, time) so the as-of pick is total
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_seq"),
        max_by(col("vm"), col("event_id")).as("purchase_vm"))
    AsOf.asofJoin(
        ev.select("event_id", "user_id", "ts"), purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("purchase_seq", "purchase_vm"))
      .select("event_id", "user_id", "purchase_seq", "purchase_vm")
      .orderBy("event_id")
  }

  /** Pivot (orders count by status x priority). */
  def pivot(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val renames = Seq("p_urgent", "p_high", "p_medium", "p_notspec",
      "p_low")
    prios.zip(renames).foldLeft(
        t(spark, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", prios)
          .agg(count(lit(1)))) { case (df, (from, to)) =>
        df.withColumnRenamed(from, to)
      }
      .na.fill(0L, renames)
      .orderBy("o_orderstatus")
  }

  /** JSON scalar access over events.props (Json-typed column, §1.2). */
  def jsonAccess(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Exact interpolated percentiles (not a sketch — same linear
    * interpolation contract as DuckDB quantile_cont).
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4)
          .as("p99_price"))
      .orderBy("l_returnflag")

  /** CUBE grouping sets. */
  def cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"), col("n"))

  /** String-function breadth (portable subset). */
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(col("p_partkey") % 10 === 0)
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        reverse(col("p_name")).as("name_rev"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("type_novowel"),
        levenshtein(col("p_brand"), lit("Brand#11")).as("brand_dist"),
        instr(col("p_name"), "a").cast("long").as("first_a"),
        element_at(split(col("p_type"), " "), 1).as("type_head"))
      .orderBy("p_partkey")

  /** Datetime-function breadth. */
  def datetimeFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("d"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
        datediff(lit("1998-01-01").cast("date"),
          col("o_orderdate").cast("date")).cast("long").as("days_to_98"))
      .orderBy("o_orderkey")

  /** Array explode with position (posexplode / unnest-with-ordinality). */
  def posexplodeQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), posexplode(col("embedding")))
      .filter(col("pos") < 4)
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("i"),
        round(col("col").cast("double"), 6).as("x"))
      .orderBy("vec_id", "i")

  /** Interval self-join via time-bucketing (RangeJoin operator):
    * event pairs of the same user within 5 minutes.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(Tables.eventsTsMicros).as("tsec"))
    RangeJoin.withinInterval(ev, Seq("user_id"), "tsec", "event_id",
        windowSec = 300L)
      .orderBy("user_id", "id_a", "id_b")
  }

  /** HLL sketch (approx_count_distinct) — no SQL-exact oracle (sketch
    * internals differ across engines); declared rows-only.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01)
          .as("approx_orders"))
      // the sketch value itself is engine-specific; the CHECKABLE
      // contract is exact values + the approx error staying inside
      // the HLL guarantee (rsd=0.01 -> 5% tolerance is ~5 sigma)
      .select(col("l_returnflag"), col("exact_parts"),
        col("exact_orders"),
        (abs(col("approx_parts") - col("exact_parts"))
          .cast("double") / col("exact_parts") <= 0.05)
          .as("parts_within_5pct"),
        (abs(col("approx_orders") - col("exact_orders"))
          .cast("double") / col("exact_orders") <= 0.05)
          .as("orders_within_5pct"))
      .orderBy("l_returnflag")

  /** Explicit GROUPING SETS (the general form behind rollup/cube):
    * ((status, priority), (status), ()) with `grouping_id`
    * disambiguating an aggregated-away column from a NULL group value.
    */
  def groupingSetsQ(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderstatus")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"),
        grouping_id().cast("long").as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"),
        col("n"))

  /** Approximate percentile vs exact, q23-style contract: the sketch
    * value is engine-specific, so the checkable columns are the exact
    * percentiles plus booleans asserting the approximation stays
    * within 5% (far looser than the rank-error guarantee at these
    * row counts).
    */
  def approxQuantile(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_exact"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4)
          .as("p90_exact"),
        expr("approx_percentile(l_quantity, 0.5, 10000)")
          .cast("double").as("p50_approx"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)")
          .cast("double").as("p90_approx"))
      .select(col("l_linestatus"), col("p50_exact"), col("p90_exact"),
        (abs(col("p50_approx") - col("p50_exact"))
          / col("p50_exact") <= 0.05).as("p50_within_5pct"),
        (abs(col("p90_approx") - col("p90_exact"))
          / col("p90_exact") <= 0.05).as("p90_within_5pct"))
      .orderBy("l_linestatus")

  /** TPC-H Q21-shaped correlated-subquery workout: suppliers that were
    * the ONLY late shipper in a multi-supplier order (EXISTS + NOT
    * EXISTS, both correlated, the NOT EXISTS additionally referencing
    * the outer join's order date). Catalyst rewrites these to
    * semi/anti joins — no per-row subquery execution.
    */
  def onlyLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT s.s_name, COUNT(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name""".stripMargin)
  }

  /** Salted two-phase aggregation (skew mitigation) — must equal the
    * plain GROUP BY exactly (decimal sums commute), which the oracle
    * of the unsalted query checks.
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Salting.saltedSumAgg(
        t(spark, dir, "lineitem"), Seq("l_suppkey"), salts = 16,
        aggs = Seq(
          "sum_qty" -> col("l_quantity").cast("decimal(18,2)"),
          "sum_price" -> col("l_extendedprice").cast("decimal(18,2)")))
      .select(col("l_suppkey"), col("n"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_price").cast("double").as("sum_price"))
      .orderBy("l_suppkey")

  /** Raw-SQL surface: the reference passes user YQL verbatim to the
    * engine (YqlQuery.java:192-193); the analog here is arbitrary Spark
    * SQL over the registered catalog (graft.Tables.registerAll), CTEs
    * and all — Catalyst plans it like any DataFrame query.
    */
  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders
        |  WHERE o_totalprice > 200000
        |)
        |SELECT n.n_name,
        |  COUNT(*) AS n_big,
        |  CAST(SUM(b.price) AS DOUBLE) AS sum_price
        |FROM big_orders b
        |JOIN customer c ON b.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin)
  }

  /** Grouped top-k via the custom TopKBy TypedImperativeAggregate
    * (bounded heap, O(k) state/group vs full window sort): top-3
    * orders per customer-nation by price. Oracle = the window-function
    * formulation in DuckDB.
    */
  def topkPerKey(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")
          .as("price"),
        col("o_orderkey"))
    joined.groupBy(col("c_nationkey"))
      .agg(graft.functions.TopKBy.topkBy(col("price"), col("o_orderkey"),
        3).as("top"))
      .select(col("c_nationkey"), posexplode(col("top")))
      .select(col("c_nationkey"), (col("pos") + 1).cast("long").as("rank"),
        col("col.ord").as("price"), col("col.id").as("o_orderkey"))
      .orderBy("c_nationkey", "rank")
  }

  /** Array/map function breadth over the embedding column. */
  def arrayFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(element_at(col("embedding"), 1).cast("double"), 6)
          .as("first"),
        round(element_at(col("embedding"), -1).cast("double"), 6)
          .as("last"),
        round(array_max(col("embedding")).cast("double"), 6).as("mx"),
        round(array_min(col("embedding")).cast("double"), 6).as("mn"),
        round(element_at(array_sort(col("embedding")), 2).cast("double"),
          6).as("second_smallest"),
        round(element_at(slice(col("embedding"), 3, 4), 1).cast("double"),
          6).as("slice_head"))
      .orderBy("vec_id")

  /** Window analytics breadth: lead/lag/ntile/percent_rank/first_value
    * (percent_rank is exact integer-ratio arithmetic -> engine-exact).
    */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 20 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        first(col("o_orderkey")).over(w).as("first_order"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Null-handling semantics: nullif/coalesce/null-safe equality,
    * null-aware aggregation counts.
    */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
      .withColumn("brand_n", nullif(col("p_brand"), lit("Brand#11")))
      .withColumn("type_n", nullif(substring(col("p_type"), 1, 5),
        lit("STAND")))
    p.groupBy(col("p_size"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("brand_n")).as("n_brand_nonnull"),
        sum(when(col("brand_n") <=> col("type_n"), 1L).otherwise(0L))
          .as("n_nullsafe_eq"),
        sum(when(coalesce(col("brand_n"), lit("X")) === "X", 1L)
          .otherwise(0L)).as("n_coalesced"))
      .orderBy("p_size")
  }

  /** TPC-H Q15 shape: revenue-per-supplier view over a ship-date
    * quarter, then the supplier(s) achieving the maximum. The max is
    * a 1-row aggregate joined back by EQUALITY on the exact decimal
    * revenue (not a correlated subquery re-scan): one lineitem pass
    * for the view, one broadcast equi-join to pick the winner —
    * revenue stays decimal(28,2)-exact until the final display cast,
    * so the max-equality join can never be bitten by FP ties.
    */
  /** NOT IN with a NULLABLE subquery column — the null-aware anti
    * join. Plain anti-join semantics ("no matching row") and NOT IN
    * semantics ("no match AND no NULL in the list") differ exactly
    * when the subquery can produce NULL; Spark plans this as a
    * null-aware broadcast hash join (streamed side checks the
    * one-null flag), which is the engine feature this query pins.
    * NULLIF keeps the column nullable at plan time without actually
    * producing a NULL, so the result is non-empty and deterministic;
    * the spec exercises the real-NULL path (result must go empty).
    */
  def nullAwareAnti(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT p_partkey, p_size FROM part
        |WHERE p_size NOT IN (
        |  SELECT NULLIF(l_linenumber + 10, 0) FROM lineitem
        |  WHERE l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin)
  }

  def topSupplierView(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val rev = li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1).cast("decimal(18,4)")
          - col("l_discount").cast("decimal(18,4)")), 2))
        .as("rev_d"))
    val mx = rev.agg(max(col("rev_d")).as("mx"))
    rev.join(broadcast(mx), col("rev_d") === col("mx"))
      .join(t(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_d").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_null_aware_anti_join" -> nullAwareAnti _,
    "q55_top_supplier_view" -> topSupplierView _,
    "q29_null_semantics" -> nullSemantics _,
    "q28_window_analytics" -> windowAnalytics _,
    "q27_array_fns" -> arrayFns _,
    "q26_topk_per_key" -> topkPerKey _,
    "q25_sql_surface" -> sqlSurface _,
    "q24_salted_agg" -> saltedAgg _,
    "q14_asof_attrib" -> asofAttrib _,
    "q15_pivot" -> pivot _,
    "q16_json_access" -> jsonAccess _,
    "q17_percentiles" -> percentiles _,
    "q18_cube" -> cube _,
    "q19_string_fns" -> stringFns _,
    "q20_datetime_fns" -> datetimeFns _,
    "q21_posexplode" -> posexplodeQ _,
    "q22_interval_join" -> intervalJoin _,
    "q23_approx_distinct" -> approxDistinct _,
    "q30_grouping_sets" -> groupingSetsQ _,
    "q31_approx_quantile" -> approxQuantile _,
    "q32_only_late_supplier" -> onlyLateSupplier _,
  )

  val oracle: Map[String, String] = Map(
    "q56_null_aware_anti_join" ->
      """SELECT p_partkey, p_size FROM part
        |WHERE p_size NOT IN (
        |  SELECT NULLIF(l_linenumber + 10, 0) FROM lineitem
        |  WHERE l_quantity > 45)
        |ORDER BY p_partkey""".stripMargin,
    "q55_top_supplier_view" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    SUM(ROUND(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * (CAST(1 AS DECIMAL(18,4))
        |        - CAST(l_discount AS DECIMAL(18,4))), 2)) AS rev_d
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_d AS DOUBLE) AS total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE rev_d = (SELECT MAX(rev_d) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q14_asof_attrib" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CAST(ROUND(value*1000) AS BIGINT) AS vm
        |  FROM events
        |), p AS (
        |  SELECT user_id, ts, MAX(event_id) AS purchase_seq,
        |    arg_max(vm, event_id) AS purchase_vm
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, p.purchase_seq, p.purchase_vm
        |FROM ev e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q15_pivot" ->
      """SELECT o_orderstatus,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS p_urgent,
        |  COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS p_high,
        |  COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS p_medium,
        |  COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
        |  COUNT(*) FILTER (o_orderpriority = '5-LOW') AS p_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q16_json_access" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q32_only_late_supplier" ->
      """SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name""".stripMargin,
    "q30_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), ())
        |ORDER BY gid, o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST, n""".stripMargin,
    "q31_approx_quantile" ->
      """SELECT l_linestatus,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_exact,
        |  ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact,
        |  TRUE AS p50_within_5pct, TRUE AS p90_within_5pct
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,
    "q17_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n""".stripMargin,
    "q19_string_fns" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  reverse(p_name) AS name_rev,
        |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_novowel,
        |  levenshtein(p_brand, 'Brand#11') AS brand_dist,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        |  split_part(p_type, ' ', 1) AS type_head
        |FROM part WHERE p_partkey % 10 = 0
        |ORDER BY p_partkey""".stripMargin,
    "q20_datetime_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  last_day(o_orderdate) AS month_end,
        |  CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS plus2m,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q21_posexplode" ->
      """SELECT vec_id, CAST(i AS BIGINT) AS i,
        |  ROUND(CAST(x AS DOUBLE), 6) AS x
        |FROM (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    unnest(embedding) AS x
        |  FROM embeddings WHERE vec_id < 20)
        |WHERE i <= 4
        |ORDER BY vec_id, i""".stripMargin,
    "q22_interval_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events)
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  b.tsec - a.tsec AS dt_sec
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND abs(a.tsec - b.tsec) <= 300
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,
    // q23: the sketch estimate is engine-specific, but exact counts
    // and the within-tolerance booleans are oracle-checkable
    "q23_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_5pct,
        |  TRUE AS orders_within_5pct
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q29_null_semantics" ->
      """WITH p AS (
        |  SELECT p_size,
        |    NULLIF(p_brand, 'Brand#11') AS brand_n,
        |    NULLIF(SUBSTRING(p_type, 1, 5), 'STAND') AS type_n
        |  FROM part)
        |SELECT p_size, COUNT(*) AS n_rows,
        |  COUNT(brand_n) AS n_brand_nonnull,
        |  CAST(SUM(CASE WHEN brand_n IS NOT DISTINCT FROM type_n
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
        |  CAST(SUM(CASE WHEN COALESCE(brand_n, 'X') = 'X'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced
        |FROM p GROUP BY p_size ORDER BY p_size""".stripMargin,
    "q28_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_orderkey, 1) OVER w AS prev_order,
        |  LEAD(o_orderkey, 1) OVER w AS next_order,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |  FIRST_VALUE(o_orderkey) OVER w AS first_order
        |FROM orders WHERE o_custkey % 20 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q27_array_fns" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS BIGINT) AS dim,
        |  ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first,
        |  ROUND(CAST(embedding[-1] AS DOUBLE), 6) AS last,
        |  ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
        |  ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
        |  ROUND(CAST(list_sort(embedding)[2] AS DOUBLE), 6) AS second_smallest,
        |  ROUND(CAST(embedding[3:6][1] AS DOUBLE), 6) AS slice_head
        |FROM embeddings WHERE vec_id < 50
        |ORDER BY vec_id""".stripMargin,
    "q26_topk_per_key" ->
      """WITH j AS (
        |  SELECT c.c_nationkey,
        |    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |    o.o_orderkey
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |), r AS (
        |  SELECT c_nationkey, price, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY price DESC, o_orderkey) AS rank
        |  FROM j)
        |SELECT c_nationkey, CAST(rank AS BIGINT) AS rank, price, o_orderkey
        |FROM r WHERE rank <= 3
        |ORDER BY c_nationkey, rank""".stripMargin,
    "q25_sql_surface" ->
      """WITH big_orders AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_totalprice > 200000)
        |SELECT n.n_name, COUNT(*) AS n_big,
        |  CAST(SUM(b.price) AS DOUBLE) AS sum_price
        |FROM big_orders b
        |JOIN customer c ON b.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,
    "q24_salted_agg" ->
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
  )
}
