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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_asof_attrib" -> asofAttrib _,
    "q15_pivot" -> pivot _,
    "q16_json_access" -> jsonAccess _,
    "q17_percentiles" -> percentiles _,
  )

  val oracle: Map[String, String] = Map(
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
        |  SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_percentiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
        |  ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        |  ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
