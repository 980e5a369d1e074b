package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality operators — the profiling/validation stage every
  * production ingest pipeline runs before training-data assembly
  * (the role Deequ/Great-Expectations play): a one-pass column
  * profiler and a declarative constraint-check suite.
  *
  * Scale shape: the profiler is ONE scan — every per-column statistic
  * (null count, exact distinct, min/max) is an aggregate of the same
  * pass; Spark plans the multi-column DISTINCT set via a single
  * Expand (one shuffle, expand factor = #distinct columns), which is
  * the canonical distributed shape for multi-distinct profiling. The
  * long-format output is a driver-free unpivot (explode over a
  * 1-row aggregate). Constraint checks are each one aggregate or one
  * broadcast/anti join; nothing rescans the fact table more than the
  * declared number of passes.
  *
  * Cross-engine canonicalization: min/max are reported as strings via
  * type-specific rules (ints/strings/timestamps cast directly;
  * doubles through DECIMAL(18,4)) so Spark and DuckDB render
  * identical bytes.
  */
object DataQuality {

  /** kind: "int" | "num" (double via decimal) | "str" | "ts" */
  private val lineitemCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int", "l_quantity" -> "num",
    "l_extendedprice" -> "num", "l_discount" -> "num",
    "l_tax" -> "num", "l_returnflag" -> "str",
    "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private def canon(c: Column, kind: String): Column = kind match {
    case "num" => c.cast("decimal(18,4)").cast("string")
    case _     => c.cast("string")
  }

  /** One-pass long-format profile of every lineitem column. */
  def profileColumns(spark: SparkSession, dir: String): DataFrame = {
    val df = t(spark, dir, "lineitem")
    val aggExprs: Seq[Column] =
      count(lit(1)).as("__n") +: lineitemCols.flatMap { case (c, k) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
          countDistinct(col(c)).as(s"${c}__nd"),
          canon(min(col(c)), k).as(s"${c}__min"),
          canon(max(col(c)), k).as(s"${c}__max"))
      }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    one
      .select(explode(array(lineitemCols.map { case (c, _) =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          col(s"${c}__nulls").as("n_nulls"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_v"),
          col(s"${c}__max").as("max_v"))
      }: _*)).as("p"))
      .select(col("p.*"))
      .withColumn("completeness", round(
        lit(1.0) - col("n_nulls").cast("double")
          / col("n_rows").cast("double"), 6))
      .orderBy("col_name")
  }

  /** Declarative constraint suite over the star schema: PK
    * uniqueness, referential integrity, domain and range rules.
    * Each check reports its violation count; `passed` = zero.
    */
  def checks(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val ord = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    def onerow(name: String, viol: DataFrame): DataFrame =
      viol.select(lit(name).as("check_name"),
        col("n_violations").cast("long").as("n_violations"))
    val pkDup = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n_violations"))
    val fkOrdCust = ord.join(cust,
        ord("o_custkey") === cust("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    val fkLiOrd = li.join(ord,
        li("l_orderkey") === ord("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    // the five row-predicate checks fuse into ONE lineitem scan (a
    // single aggregate of five conditional sums, unpivoted to rows) —
    // at 100 TB every separate check-scan of the fact table is real
    // cost; only the PK groupBy and the two FK anti-joins need their
    // own pass
    val rowChecks: Seq[(String, Column)] = Seq(
      "lineitem_quantity_positive" ->
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)),
      "lineitem_discount_range" ->
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)),
      "lineitem_price_nonnegative" ->
        sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)),
      "lineitem_returnflag_domain" ->
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1L)
          .otherwise(0L)),
      "lineitem_shipdate_not_null" ->
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)))
    val fusedAggs = rowChecks.zipWithIndex.map { case ((_, c), i) =>
      c.as(s"v_$i") }
    val fused = li.agg(fusedAggs.head, fusedAggs.tail: _*)
      .select(explode(array(rowChecks.zipWithIndex.map {
        case ((name, _), i) =>
          struct(lit(name).as("check_name"),
            col(s"v_$i").cast("long").as("n_violations"))
      }: _*)).as("c"))
      .select(col("c.*"))
    Seq(
      onerow("lineitem_pk_unique", pkDup),
      onerow("orders_custkey_fk", fkOrdCust),
      onerow("lineitem_orderkey_fk", fkLiOrd),
      fused)
      .reduce(_.unionAll(_))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("check_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_profile_columns" -> profileColumns _,
    "dq_checks" -> checks _)

  private val profileOracle: String = {
    val blocks = lineitemCols.map { case (c, k) =>
      val mn = if (k == "num")
        s"CAST(CAST(MIN($c) AS DECIMAL(18,4)) AS VARCHAR)"
      else s"CAST(MIN($c) AS VARCHAR)"
      val mx = if (k == "num")
        s"CAST(CAST(MAX($c) AS DECIMAL(18,4)) AS VARCHAR)"
      else s"CAST(MAX($c) AS VARCHAR)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nulls,
  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
  $mn AS min_v, $mx AS max_v,
  ROUND(1.0 - CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
    AS DOUBLE) / COUNT(*), 6) AS completeness
FROM lineitem"""
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  private val checksOracle: String =
    """WITH v AS (
      |  SELECT 'lineitem_pk_unique' AS check_name,
      |    CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS n_violations
      |  FROM (SELECT COUNT(*) AS cnt FROM lineitem
      |        GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
      |  UNION ALL
      |  SELECT 'orders_custkey_fk',
      |    CAST(COUNT(*) AS BIGINT) FROM orders o
      |  WHERE NOT EXISTS (SELECT 1 FROM customer c
      |    WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_fk',
      |    CAST(COUNT(*) AS BIGINT) FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'lineitem_quantity_positive',
      |    CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_discount_range',
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_price_nonnegative',
      |    CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_returnflag_domain',
      |    CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
      |      THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_shipdate_not_null',
      |    CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
      |      AS BIGINT) FROM lineitem)
      |SELECT check_name, n_violations, n_violations = 0 AS passed
      |FROM v ORDER BY check_name""".stripMargin

  val oracle: Map[String, String] = Map(
    "dq_profile_columns" -> profileOracle,
    "dq_checks" -> checksOracle)
}
