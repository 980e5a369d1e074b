package graft

import graft.Tables.t
import graft.operators.{Ext36Queries, KeyedMerge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the unpivot / lateral / outer-IVM batch. */
class Ext36OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("unpivot: three measures per flag, totals match wide-form " +
    "aggregates") {
    val rows = Ext36Queries.unpivotMeasures(spark, TestSpark.sfDir)
      .collect()
    val flags = rows.map(_.getString(0)).distinct
    flags.foreach { f =>
      val ms = rows.filter(_.getString(0) == f).map(_.getString(1))
      assert(ms.sorted.toSeq ===
        Seq("discount_pct", "extendedprice", "quantity"))
    }
    // per (flag, measure) n equals the wide row count for the flag
    val wide = t(spark, TestSpark.sfDir, "lineitem")
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === wide(r.getString(0)),
        s"${r.getString(0)}/${r.getString(1)} row count")
    }
    // spot-check the quantity total against the wide aggregate
    // (output is DOUBLE cast from the exact decimal sum — r6)
    val wantQty = t(spark, TestSpark.sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)"))
        .cast("double").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_.getString(1) == "quantity").foreach { r =>
      assert(r.getDouble(3) === wantQty(r.getString(0)))
    }
  }

  test("lateral top-n: decorrelated (no per-row subquery), and " +
    "equals the window formulation") {
    val df = Ext36Queries.lateralTopN(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "lateral must decorrelate, not cross-join")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val want = t(spark, TestSpark.sfDir, "customer")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .join(t(spark, TestSpark.sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got.toSet === want)
    assert(got.length === want.size)
    // per nation exactly <=2 rows
    got.groupBy(_._1).foreach { case (_, g) => assert(g.length <= 2) }
  }

  test("outer ivm: incremental == native full recompute, including " +
    "null-padded rows") {
    val ev = t(spark, TestSpark.sfDir, "events").select(col("event_id"),
      col("user_id"), col("event_type"),
      round(col("value") * 1000).cast("long").as("value_milli"))
    val a = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id").as("a_seq"),
        col("value_milli").as("a_val"))
    val b = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("event_id").as("b_seq"),
        col("event_type").as("b_type"))
    val full = KeyedMerge.lww(a, Seq("user_id"), "a_seq")
      .join(KeyedMerge.lww(b, Seq("user_id"), "b_seq"),
        Seq("user_id"), "left")
      .select("user_id", "a_val", "a_seq", "b_type", "b_seq")
    val ivm = Ext36Queries.ivmOuter(spark, TestSpark.sfDir)
    assert(ivm.exceptAll(full).isEmpty && full.exceptAll(ivm).isEmpty,
      "IVM != full recompute")
    // the fixture must exercise the null-padded branch
    assert(ivm.filter(col("b_type").isNull).count() > 0 ||
      full.filter(col("b_type").isNull).count() === 0)
  }
}
