package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.2/§2.3): the YQL-over-batch
  * transform surface the reference delegates to its server — filters,
  * joins, aggregates, windows, sorts, set ops — expressed Spark-first
  * with the DataFrame API so Catalyst plans them (pushdown, pruning,
  * join selection, AQE all free).
  *
  * Oracle-portability rules (DuckDB hash-match):
  *  - money math in exact DecimalType, each product explicitly rounded
  *    back to scale 2/4 (both engines round half-away-from-zero), final
  *    cast to double (exact decimal -> correctly-rounded double in both);
  *  - every query ends in a total-order sort (all columns) so row order
  *    is deterministic across engines.
  */
object Relational {

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec4(c: Column): Column = c.cast("decimal(18,4)")
  /** price * (1 - discount) rounded back to an exact scale-2 decimal.
    * round() (not a downscale cast): Spark HALF_UP == DuckDB
    * half-away-from-zero, whereas DuckDB's decimal->decimal cast
    * truncates.
    */
  private def discPrice(price: Column, disc: Column): Column =
    round(dec2(price) * (lit(1).cast("decimal(18,4)") - dec4(disc)), 2)

  /** TPC-H Q1-style pricing summary: hash aggregate with partial
    * (map-side) combine; one shuffle on the two low-cardinality keys.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Selective filter + narrow projection: predicate and column pruning
    * must reach the parquet scan (PushedFilters/ReadSchema).
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_discount") >= 0.05 && col("l_quantity") < 10.0 &&
        col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** 3-way join + aggregate (customer ⋈ orders ⋈ lineitem): big-side
    * shuffle joins planned by Catalyst; revenue per market segment.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val li = t(spark, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Star-schema join with explicitly broadcast dims (region, nation):
    * at 100 TB the fact side never shuffles for dim joins this small.
    */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_cust"),
        sum(dec2(col("c_acctbal"))).cast("double").as("sum_bal"))
      .orderBy(col("r_name"))
  }

  /** Window functions: rank within partition + running sum — single
    * shuffle on the partition key, sort within partitions.
    */
  def q5Window(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"),
        sum(dec2(col("o_totalprice"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
      .filter(col("rn") <= 3)
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    * per-partition heap then driver merge, no full sort at scale.
    */
  def q6TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)

  /** Set operations: UNION / INTERSECT / EXCEPT over customer-key sets
    * derived from order priority classes.
    */
  def q7SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val high = o.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_custkey"))
    val both = urgent.intersect(high).withColumn("tag", lit("both"))
    val onlyU = urgent.except(high).withColumn("tag", lit("urgent_only"))
    both.unionByName(onlyU)
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .orderBy(col("tag"))
  }

  /** ROLLUP aggregate (grouping-set expansion handled by Catalyst). */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"),
        col("n_orders"))
  }

  /** Semi/anti joins (EXISTS / NOT EXISTS): left_semi + left_anti —
    * no payload from the right side is ever materialized.
    */
  def q9SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").select(col("o_custkey"))
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("has_orders").as("tag"), col("c_custkey"))
    val noO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("no_orders").as("tag"), col("c_custkey"))
    withO.unionByName(noO)
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .orderBy(col("tag"))
  }

  /** Scalar function surface: string / date / math built-ins (§2.3) —
    * all codegen'd, no UDFs.
    */
  def q10ScalarFns(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    p.filter(col("p_size").between(10, 20))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        abs(col("p_retailprice").cast("decimal(18,2)") - 1000)
          .cast("double").as("price_dist"))
      .orderBy(col("p_partkey"))
  }

  /** Distinct aggregates + HAVING-style post-aggregation filter. */
  def q11DistinctHaving(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
      .filter(col("n_parts") >= 5)
      .orderBy(col("l_suppkey"))
  }

  /** Conditional aggregation (CASE WHEN inside agg) + date bucketing. */
  def q12CaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
          .as("n_filled"),
        sum(when(col("o_orderstatus") =!= "F", 1L).otherwise(0L))
          .as("n_open"),
        max(dec2(col("o_totalprice"))).cast("double").as("max_price"))
      .orderBy(col("month"))
  }

  /** Correlated-style scalar subquery: customers whose account balance
    * exceeds their nation's average — expressed as join against a
    * pre-aggregated (broadcastable) per-nation average.
    */
  def q13AboveAvg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val avgByNation = c.groupBy(col("c_nationkey").as("nk"))
      .agg((sum(dec2(col("c_acctbal"))).cast("double") /
        count(lit(1))).as("avg_bal"))
    c.join(broadcast(avgByNation), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("c_nationkey"))
  }

  /** DuckDB oracle SQL — same semantics, same column names, same total
    * order. NULLS FIRST is spelled out (DuckDB defaults nulls-last,
    * Spark nulls-first).
    */
  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 2)) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_quantity < 10.0 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_join_agg" ->
      """SELECT c_mktsegment,
        |  CAST(SUM(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))), 2)) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT r_name, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q5_window" ->
      """SELECT o_custkey, o_orderkey, rn, running_spend FROM (
        |  SELECT o_custkey, o_orderkey,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |  FROM orders) x
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q6_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 25""".stripMargin,
    "q7_setops" ->
      """WITH urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |     high AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
        |     tagged AS (
        |       SELECT 'both' AS tag, o_custkey FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM high)
        |       UNION ALL
        |       SELECT 'urgent_only' AS tag, o_custkey FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM high))
        |SELECT tag, COUNT(*) AS n FROM tagged GROUP BY tag ORDER BY tag""".stripMargin,
    "q8_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n_orders""".stripMargin,
    "q9_semi_anti" ->
      """WITH tagged AS (
        |  SELECT 'has_orders' AS tag, c_custkey FROM customer
        |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  UNION ALL
        |  SELECT 'no_orders' AS tag, c_custkey FROM customer
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
        |SELECT tag, COUNT(*) AS n FROM tagged GROUP BY tag ORDER BY tag""".stripMargin,
    "q10_scalar_fns" ->
      """SELECT p_partkey,
        |  UPPER(p_brand) AS brand_u,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  SUBSTRING(p_type, 1, 5) AS type5,
        |  CAST(p_size % 7 AS BIGINT) AS size_mod,
        |  CAST(ABS(CAST(p_retailprice AS DECIMAL(18,2)) - 1000) AS DOUBLE) AS price_dist
        |FROM part
        |WHERE p_size BETWEEN 10 AND 20
        |ORDER BY p_partkey""".stripMargin,
    "q11_distinct_having" ->
      """SELECT l_suppkey,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY l_suppkey
        |HAVING COUNT(DISTINCT l_partkey) >= 5
        |ORDER BY l_suppkey""".stripMargin,
    "q12_case_agg" ->
      """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
        |  CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
        |FROM orders
        |GROUP BY DATE_TRUNC('month', o_orderdate)
        |ORDER BY month""".stripMargin,
    "q13_above_avg" ->
      """WITH nav AS (
        |  SELECT c_nationkey AS nk,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
        |  FROM customer GROUP BY c_nationkey)
        |SELECT c_nationkey, COUNT(*) AS n_above
        |FROM customer JOIN nav ON c_nationkey = nk
        |WHERE c_acctbal > avg_bal
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> q1PricingSummary _,
    "q2_filter_project" -> q2FilterProject _,
    "q3_join_agg" -> q3JoinAgg _,
    "q4_broadcast_join" -> q4BroadcastJoin _,
    "q5_window" -> q5Window _,
    "q6_topk" -> q6TopK _,
    "q7_setops" -> q7SetOps _,
    "q8_rollup" -> q8Rollup _,
    "q9_semi_anti" -> q9SemiAnti _,
    "q10_scalar_fns" -> q10ScalarFns _,
    "q11_distinct_having" -> q11DistinctHaving _,
    "q12_case_agg" -> q12CaseAgg _,
    "q13_above_avg" -> q13AboveAvg _,
  )
}
