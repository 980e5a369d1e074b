package graft

import graft.Tables.t
import graft.operators.{Ext50Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the partitioned-sink / bucketed-join / Louvain
  * batch.
  */
class Ext50OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hive partitioned: scan prunes on partition columns and the " +
    "read-back aggregate matches the direct one") {
    val df = Ext50Queries.hivePartitioned(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "no partition filter node")
    assert(plan.contains("event_type") && plan.contains("day"),
      "partition predicate must mention both partition columns")
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .filter(col("event_type") === "purchase"
        && col("day").between(19725, 19730))
      .groupBy("event_type", "day")
      .agg(count(lit(1)), sum("vm"), countDistinct("user_id"))
      .orderBy("day").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty, "pruned range must still hit data")
  }

  test("bucketed join: both sides read bucketed, merge join runs " +
    "with ZERO shuffle before the final sort") {
    val df = Ext50Queries.bucketedJoin(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), "expected a merge join")
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"),
      "scan must be bucket-aware")
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange"),
      "bucketed join must not shuffle either side")
    // result parity with a plain (non-bucketed) recompute
    val ev = t(spark, TestSpark.sfDir, "events").select(
      col("user_id"),
      expr("cast(round(value * 1000) as bigint)").as("vm"),
      col("event_type"),
      expr("cast(ts div 86400000000000 as bigint)").as("day"))
    val dim = ev.groupBy("user_id")
      .agg(min("day").as("first_day"), count(lit(1)).as("n_total"))
    val want = ev.filter(col("event_type") === "purchase")
      .join(dim, "user_id")
      .groupBy("user_id", "first_day", "n_total")
      .agg(count(lit(1)).as("n_purch"), sum("vm").as("s_milli"))
      .orderBy("user_id").collect().map(_.toSeq)
    assert(df.collect().map(_.toSeq).toSeq === want.toSeq)
  }

  test("louvain round: exact replay of the integer ΔQ argmax from " +
    "the collected edge list") {
    val pairs = NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = und.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m2 = und.length.toLong
    val labels = und.groupBy(_._1).map { case (i, es) =>
      val cands = es.groupBy(_._2).map { case (j, dup) =>
        (j, dup.length.toLong * m2 - deg(i) * deg(j))
      }.toSeq :+ ((i, 0L))
      i -> cands.minBy { case (c, s) => (-s, c) }._1
    }
    val wantHist = labels.groupBy(_._2).map { case (l, ns) =>
      (l, ns.size.toLong, ns.count(kv => kv._1 != l).toLong)
    }.toSeq.sortBy(_._1)
    val got = Ext50Queries.louvainRound(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === wantHist)
    assert(got.map(_._2).sum === deg.size.toLong,
      "every node labeled exactly once")
    assert(got.map(_._3).sum > 0, "at least one node must move")
  }
}
