package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 2: community structure and series risk.
  *
  *  - `graph_label_prop`: synchronous label propagation (3 fixed
  *    iterations, neighbor-label mode with deterministic min-label
  *    tie-break) over the customer–supplier interaction graph — the
  *    cheap community detector that complements `graph_modularity`
  *    (which SCORES a given partition) by PRODUCING one.
  *  - `graph_bipartite_project`: supplier co-customer projection of
  *    the bipartite customer→supplier graph — edge weight = shared
  *    customers, cosine-normalized by degree; the "related items"
  *    graph builder. Hub customers above a degree cap are excluded
  *    from pair generation (the graph_link_predict rule) — the
  *    pair fan-out is Σ min(deg, cap)², never Σ deg².
  *  - `ts_drawdown`: per-event-type max drawdown of the cumulative
  *    daily value series (running peak minus running sum) — the risk
  *    statistic every monitoring dashboard wants; windows run over
  *    |days|-sized per-type series, never row grain.
  *
  * All integer-lattice: labels are node ids (bigint), weights are
  * shared-customer counts with micro cosine via double sqrt on two
  * exact integers (identical expression text both engines), series
  * are milli-unit sums. Hash-exact against DuckDB oracles.
  *
  * 100 TB shapes: LPA is 3 × (join on dst + mode-aggregate on
  * (node,label)) — the same shuffle schedule as pagerank, with the
  * label table AQE-broadcast when small; the projection generates
  * pairs per customer bounded by the cap (quadratic only in the cap);
  * drawdown collapses to day grain in the first aggregate.
  */
object Ext28Queries {

  /** Undirected customer–supplier edge list (both directions),
    * suppliers offset into their own id space — the Ext5Queries
    * pagerank graph, cached (plan-keyed, so pagerank/LPA share the
    * entry when both run in one session).
    */
  private[operators] def custSuppEdges(spark: SparkSession, dir: String)
      : DataFrame = {
    val oneWay = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    oneWay.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(oneWay.select(col("supp").as("src"),
        col("cust").as("dst")))
      .cache()
  }

  // ---------------------------------------------------------------
  // graph_label_prop
  // ---------------------------------------------------------------

  /** Synchronous LPA: label(v) starts as v; each iteration every node
    * adopts the most frequent label among its neighbors, ties to the
    * smallest label. Deterministic by construction (no async sweep
    * order dependence — that is WHY the synchronous variant is the
    * distributed one). Three iterations; the community table then
    * reports per-node label plus final community sizes.
    */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    val labels = lpaLabelTable(spark, dir)
    val sizes = labels.groupBy("label")
      .agg(count(lit(1)).as("community_size"))
    labels.join(sizes, "label")
      .select(col("node"),
        when(col("node") >= 1000000L, "supplier").otherwise("customer")
          .as("kind"),
        col("label"), col("community_size"))
      .orderBy("node")
  }

  /** The stored LPA label table (3 iterations over the customer–
    * supplier graph) — parquet-materialized once per JVM per dir via
    * [[graft.Derived]] (the NearDupGraph convention): labelProp and
    * graph_conductance both read it, and it survives the harness'
    * between-query clearCache. At 100 TB this IS the stored
    * community assignment a pipeline refreshes periodically.
    */
  private[graft] def lpaLabelTable(spark: SparkSession,
      dir: String): DataFrame =
    graft.Derived.table(spark, s"lpalabels3:$dir")(
      lpaLabels3(custSuppEdges(spark, dir)))

  /** Three synchronous LPA iterations over an undirected edge list —
    * the computation behind [[lpaLabelTable]].
    */
  private[operators] def lpaLabels3(edges: DataFrame): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      // mode with min-label tie-break as TWO HASH AGGREGATES — both
      // get map-side partial combine, unlike the row_number window
      // formulation (sort + no partial agg), which probed 23 s warm
      // at sf1 vs ~3 s for this shape: max(struct(cnt, -label))
      // picks (max count, then min label) lexicographically.
      labels = edges
        .join(labels.withColumnRenamed("node", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src"), col("label").as("nlabel"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("src"))
        .agg(max(struct(col("cnt"), (-col("nlabel")).as("neg")))
          .as("best"))
        .select(col("src").as("node"), (-col("best.neg")).as("label"))
    }
    labels
  }

  // ---------------------------------------------------------------
  // graph_bipartite_project
  // ---------------------------------------------------------------

  /** Supplier co-customer projection: for each customer with at most
    * `cap` distinct suppliers, emit each supplier pair; weight =
    * number of shared customers, cosine = w / sqrt(deg_a * deg_b)
    * where deg = capped-customer degree (the projection's own
    * universe — self-consistent). Top-50 edges by (w desc, a, b).
    */
  def bipartiteProject(spark: SparkSession, dir: String): DataFrame = {
    val cap = 25
    val cs = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val keep = cs.groupBy("cust").agg(count(lit(1)).as("cdeg"))
      .filter(col("cdeg") <= cap).select("cust")
    val cs2 = cs.join(keep, "cust").cache()
    val deg = cs2.groupBy("supp").agg(count(lit(1)).as("deg"))
    val pairs = cs2.as("a").join(cs2.as("b"),
        col("a.cust") === col("b.cust") &&
          col("a.supp") < col("b.supp"))
      .groupBy(col("a.supp").as("supp_a"), col("b.supp").as("supp_b"))
      .agg(count(lit(1)).as("shared_customers"))
    pairs
      .join(deg.select(col("supp").as("supp_a"),
        col("deg").as("deg_a")), "supp_a")
      .join(deg.select(col("supp").as("supp_b"),
        col("deg").as("deg_b")), "supp_b")
      .select(col("supp_a"), col("supp_b"), col("shared_customers"),
        col("deg_a"), col("deg_b"),
        // identical expression text in the oracle
        expr("cast(round(cast(shared_customers as double)" +
          " / sqrt(cast(deg_a as double) * cast(deg_b as double))" +
          " * 1000000) as bigint)").as("cosine_micro"))
      .orderBy(col("shared_customers").desc, col("supp_a"),
        col("supp_b"))
      .limit(50)
  }

  // ---------------------------------------------------------------
  // ts_drawdown
  // ---------------------------------------------------------------

  /** Max drawdown of the cumulative daily value series per event
    * type: cum(d) = running milli-value sum by day, peak(d) =
    * running max of cum, drawdown(d) = peak(d) − cum(d). Reports the
    * maximum drawdown, the day it bottomed (first such day), and the
    * series endpoints. value is always positive in the fixture, so
    * the spec exercises the identity dd_max ≥ 0 with equality iff
    * the series never dips — the operator's algebra is sign-agnostic
    * (a production series sums signed flows).
    */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        // signed flow: purchases add, errors subtract — gives the
        // series real dips so the drawdown is non-trivial
        when(col("event_type") === "error",
          -expr("cast(round(value * 1000) as bigint)"))
          .otherwise(expr("cast(round(value * 1000) as bigint)"))
          .as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum("vm").as("flow"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val series = daily
      .withColumn("cum", sum("flow").over(wCum))
      .withColumn("peak", max("cum").over(wCum))
      .withColumn("dd", col("peak") - col("cum"))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("dd").desc, col("day"))
    series
      .withColumn("rk", row_number().over(wPick))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        max(when(col("rk") === 1, col("dd"))).as("max_drawdown_milli"),
        max(when(col("rk") === 1, col("day"))).as("trough_day"),
        max("peak").as("peak_milli"),
        max(when(col("rk") === 1, col("peak"))).as("peak_at_trough_milli"),
        sum("flow").as("final_milli"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_label_prop" -> labelProp _,
    "graph_bipartite_project" -> bipartiteProject _,
    "ts_drawdown" -> drawdown _,
  )

  val oracle: Map[String, String] = Map(
    "graph_label_prop" ->
      """WITH one_way AS (
        |  SELECT DISTINCT o.o_custkey AS cust,
        |    l.l_suppkey + 1000000 AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |), edges AS (
        |  SELECT cust AS src, supp AS dst FROM one_way
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM one_way
        |), l0 AS (
        |  SELECT DISTINCT src AS node, src AS label FROM edges
        |), i1 AS (
        |  SELECT src AS node, nlabel AS label FROM (
        |    SELECT e.src, l.label AS nlabel, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY e.src
        |        ORDER BY count(*) DESC, l.label) AS rk
        |    FROM edges e JOIN l0 l ON e.dst = l.node
        |    GROUP BY e.src, l.label) x WHERE rk = 1
        |), i2 AS (
        |  SELECT src AS node, nlabel AS label FROM (
        |    SELECT e.src, l.label AS nlabel, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY e.src
        |        ORDER BY count(*) DESC, l.label) AS rk
        |    FROM edges e JOIN i1 l ON e.dst = l.node
        |    GROUP BY e.src, l.label) x WHERE rk = 1
        |), i3 AS (
        |  SELECT src AS node, nlabel AS label FROM (
        |    SELECT e.src, l.label AS nlabel, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY e.src
        |        ORDER BY count(*) DESC, l.label) AS rk
        |    FROM edges e JOIN i2 l ON e.dst = l.node
        |    GROUP BY e.src, l.label) x WHERE rk = 1
        |), sizes AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS community_size
        |  FROM i3 GROUP BY label)
        |SELECT i3.node,
        |  CASE WHEN i3.node >= 1000000 THEN 'supplier'
        |    ELSE 'customer' END AS kind,
        |  i3.label, s.community_size
        |FROM i3 JOIN sizes s ON i3.label = s.label
        |ORDER BY i3.node""".stripMargin,
    "graph_bipartite_project" ->
      """WITH cs AS (
        |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |), keep AS (
        |  SELECT cust FROM cs GROUP BY cust HAVING count(*) <= 25
        |), cs2 AS (
        |  SELECT cs.cust, cs.supp FROM cs JOIN keep USING (cust)
        |), deg AS (
        |  SELECT supp, CAST(count(*) AS BIGINT) AS deg
        |  FROM cs2 GROUP BY supp
        |), pairs AS (
        |  SELECT a.supp AS supp_a, b.supp AS supp_b,
        |    CAST(count(*) AS BIGINT) AS shared_customers
        |  FROM cs2 a JOIN cs2 b
        |    ON a.cust = b.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp)
        |SELECT p.supp_a, p.supp_b, p.shared_customers,
        |  da.deg AS deg_a, db.deg AS deg_b,
        |  cast(round(cast(shared_customers as double)
        |    / sqrt(cast(da.deg as double) * cast(db.deg as double))
        |    * 1000000) as bigint) AS cosine_micro
        |FROM pairs p
        |JOIN deg da ON p.supp_a = da.supp
        |JOIN deg db ON p.supp_b = db.supp
        |ORDER BY p.shared_customers DESC, p.supp_a, p.supp_b
        |LIMIT 50""".stripMargin,
    "ts_drawdown" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CASE WHEN event_type = 'error'
        |      THEN -CAST(round(value * 1000) AS BIGINT)
        |      ELSE CAST(round(value * 1000) AS BIGINT) END)
        |      AS BIGINT) AS flow
        |  FROM events GROUP BY 1, 2
        |), cums AS (
        |  SELECT event_type, day, flow,
        |    sum(flow) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM daily
        |), series AS (
        |  SELECT *, max(cum) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM cums
        |), dd AS (
        |  SELECT *, peak - cum AS dd,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY peak - cum DESC, day) AS rk
        |  FROM series)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(max(CASE WHEN rk = 1 THEN dd END) AS BIGINT)
        |    AS max_drawdown_milli,
        |  CAST(max(CASE WHEN rk = 1 THEN day END) AS BIGINT)
        |    AS trough_day,
        |  CAST(max(peak) AS BIGINT) AS peak_milli,
        |  CAST(max(CASE WHEN rk = 1 THEN peak END) AS BIGINT)
        |    AS peak_at_trough_milli,
        |  CAST(sum(flow) AS BIGINT) AS final_milli
        |FROM dd GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
