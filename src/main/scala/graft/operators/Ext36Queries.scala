package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 batch 10: relational-surface breadth (unpivot, lateral
  * top-n) and outer-join IVM.
  *
  *  - `q73_unpivot`: the melt/unpivot operator (`Dataset.unpivot`,
  *    Spark 3.4+ API surface) — lineitem's measure columns stacked
  *    into (measure, value) rows and re-aggregated; proves the wide→
  *    long reshaping leg of the relational surface (the YQL user
  *    would write a UNION ALL; the engine provides the operator).
  *  - `q74_lateral_topn`: correlated LATERAL subquery — top-2
  *    customers by balance per nation via a lateral join (the SQL
  *    form; Catalyst decorrelates it to the same window plan a
  *    DataFrame would build — asserted by the spec).
  *  - `cdc_ivm_outer`: incremental maintenance of a LEFT OUTER join
  *    view — the hard IVM case: a delta on the right side can both
  *    CREATE a match (retracting the null-padded row) and DESTROY
  *    one (reinstating it). Same touched-key contract as
  *    cdc_ivm_join; IVM == full recompute is the oracle invariant.
  *
  * 100 TB shapes: unpivot is a narrow flatMap (rows × measures, no
  * shuffle before the re-aggregate); the lateral top-n decorrelates
  * to one window over the join (no per-row subquery execution); the
  * outer IVM touches |delta keys| state rows only.
  */
object Ext36Queries {

  // ---------------------------------------------------------------
  // q73_unpivot
  // ---------------------------------------------------------------

  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("decimal(18,2)").as("quantity"),
        col("l_extendedprice").cast("decimal(18,2)")
          .as("extendedprice"),
        (col("l_discount").cast("decimal(18,4)") * 100)
          .cast("decimal(18,2)").as("discount_pct"))
    li.unpivot(
        ids = Array(col("l_returnflag")),
        values = Array(col("quantity"), col("extendedprice"),
          col("discount_pct")),
        variableColumnName = "measure",
        valueColumnName = "val")
      .groupBy("l_returnflag", "measure")
      // Final outputs are DOUBLE (cast from the exact decimal
      // aggregates) — the catalog's hash gate canonicalizes DOUBLE
      // identically across read paths, DECIMAL it does not (r5
      // verdict: q73/q74 were the only DECIMAL-emitting queries and
      // the only hash mismatches; values were already exact).
      .agg(count(lit(1)).as("n"),
        sum("val").cast("decimal(22,2)").cast("double").as("total"),
        min("val").cast("double").as("min_val"),
        max("val").cast("double").as("max_val"))
      .orderBy("l_returnflag", "measure")
  }

  // ---------------------------------------------------------------
  // q74_lateral_topn
  // ---------------------------------------------------------------

  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT n.n_name, t.c_custkey, t.bal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 2
        |) t
        |ORDER BY n.n_name, t.bal DESC, t.c_custkey""".stripMargin)
  }

  // ---------------------------------------------------------------
  // cdc_ivm_outer
  // ---------------------------------------------------------------

  /** LEFT OUTER join view IVM: A = per-user latest value row (even
    * event ids), B = per-user latest type row (odd ids); ~20%
    * (seq % 5 = 4) arrive as the delta. V = LWW(A) LEFT JOIN LWW(B).
    * Touched keys (either side's delta) are recomputed from pruned
    * state and swapped in:
    *   V_new = (V_old anti touched) ∪ (LWW(A|touched) LEFT JOIN
    *           LWW(B|touched))
    * — the null-padded ↔ matched transitions are handled by the
    * recompute leg by construction.
    */
  def ivmOuter(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(col("event_id"),
      col("user_id"), col("event_type"),
      round(col("value") * 1000).cast("long").as("value_milli"))
    val a = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id").as("a_seq"),
        col("value_milli").as("a_val"))
    val b = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("event_id").as("b_seq"),
        col("event_type").as("b_type"))
    val aBase = a.filter(col("a_seq") % 5 =!= 4)
    val bBase = b.filter(col("b_seq") % 5 =!= 4)
    val vOld = KeyedMerge.lww(aBase, Seq("user_id"), "a_seq")
      .join(KeyedMerge.lww(bBase, Seq("user_id"), "b_seq"),
        Seq("user_id"), "left")
    val touched = a.filter(col("a_seq") % 5 === 4).select("user_id")
      .union(b.filter(col("b_seq") % 5 === 4).select("user_id"))
      .distinct()
    val aNewT = KeyedMerge.lww(
      a.join(touched, Seq("user_id"), "left_semi"),
      Seq("user_id"), "a_seq")
    val bNewT = KeyedMerge.lww(
      b.join(touched, Seq("user_id"), "left_semi"),
      Seq("user_id"), "b_seq")
    vOld.join(touched, Seq("user_id"), "left_anti")
      .unionByName(aNewT.join(bNewT, Seq("user_id"), "left"))
      .select("user_id", "a_val", "a_seq", "b_type", "b_seq")
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_unpivot" -> unpivotMeasures _,
    "q74_lateral_topn" -> lateralTopN _,
    "cdc_ivm_outer" -> ivmOuter _,
  )

  val oracle: Map[String, String] = Map(
    "q73_unpivot" ->
      """WITH li AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS quantity,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS extendedprice,
        |    CAST(CAST(l_discount AS DECIMAL(18,4)) * 100
        |      AS DECIMAL(18,2)) AS discount_pct
        |  FROM lineitem
        |), m AS (
        |  SELECT l_returnflag, 'quantity' AS measure, quantity AS val
        |  FROM li
        |  UNION ALL
        |  SELECT l_returnflag, 'extendedprice', extendedprice FROM li
        |  UNION ALL
        |  SELECT l_returnflag, 'discount_pct', discount_pct FROM li)
        |SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(val) AS DECIMAL(22,2)) AS DOUBLE) AS total,
        |  CAST(min(val) AS DOUBLE) AS min_val,
        |  CAST(max(val) AS DOUBLE) AS max_val
        |FROM m GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q74_lateral_topn" ->
      """SELECT n.n_name, t.c_custkey, t.bal
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal
        |  FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey
        |  LIMIT 2
        |) t
        |ORDER BY n.n_name, t.bal DESC, t.c_custkey""".stripMargin,
    // full recompute of the same LEFT OUTER view
    "cdc_ivm_outer" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS value_milli
        |  FROM events
        |), a AS (
        |  SELECT user_id, event_id AS a_seq, value_milli AS a_val,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |  FROM ev WHERE event_id % 2 = 0
        |), b AS (
        |  SELECT user_id, event_id AS b_seq, event_type AS b_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |  FROM ev WHERE event_id % 2 = 1
        |)
        |SELECT a.user_id, a.a_val, a.a_seq, b.b_type, b.b_seq
        |FROM (SELECT * FROM a WHERE rn = 1) a
        |LEFT JOIN (SELECT * FROM b WHERE rn = 1) b
        |  ON a.user_id = b.user_id
        |ORDER BY a.user_id""".stripMargin,
  )
}
