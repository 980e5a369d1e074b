package graft

import graft.Tables.t
import graft.operators.{CdcQueries, Ext17Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the funnel-latency /
  * chi-square / compaction batch: rank-selection definition replay,
  * the chi-square marginal identities (telescoping residuals, dense
  * grid coverage), and compaction conservation (dead + live = msgs,
  * buckets partition the key space).
  */
class Ext17OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funnel latency percentiles match a driver-side sort-and-pick") {
    val rows = Ext17Queries.funnelLatency(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet ===
      Set("view_to_click", "click_to_purchase"))
    rows.foreach { case (_, n, p50, p90, mx) =>
      assert(n > 0)
      assert(p50 <= p90 && p90 <= mx)
      assert(p50 >= 0)
    }
    // definition replay for one step off the raw fixture
    val e = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view"))
    val c = e.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("t_view"))
      .groupBy("user_id").agg(min("us").as("t_click"))
    val dts = c.join(v, Seq("user_id"))
      .select((col("t_click") - col("t_view")).as("dt"))
      .collect().map(_.getLong(0)).sorted
    val n = dts.length
    val expP50 = dts(((n - 1) * 50 / 100).toInt)
    val expP90 = dts(((n - 1) * 90 / 100).toInt)
    val vc = rows.find(_._1 == "view_to_click").get
    assert((vc._2, vc._3, vc._4, vc._5) ===
      ((n.toLong, expP50, expP90, dts.last)))
  }

  test("chi-square: dense grid, marginal identities, df") {
    val rows = Ext17Queries.chi2Independence(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val nSrc = rows.map(_._1).distinct.length
    val nLang = rows.map(_._2).distinct.length
    assert(rows.length === nSrc * nLang, "grid must be dense")
    assert(rows.forall(_._7 === (nSrc - 1).toLong * (nLang - 1)))
    val total = t(spark, TestSpark.sfDir, "documents").count()
    assert(rows.map(_._3).sum === total, "cells must sum to N")
    // E sums to ~N·1e6 per construction (floor loss < one cell each)
    val eSum = rows.map(_._4).sum
    assert(eSum <= total * 1000000L &&
      eSum > total * 1000000L - rows.length * 1000000L)
    // chi2 total column consistent with the per-cell contributions
    assert(rows.forall(_._6 === rows.map(_._5).sum))
    assert(rows.forall(_._5 >= 0))
  }

  test("compaction plan: conservation and amplification floor") {
    val rows = CdcQueries.compactionPlan(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, msgs, keys, live, dead, amp) =>
      assert(bucket >= 0 && bucket < 16)
      assert(live + dead === msgs)
      assert(live <= keys, "live rows are at most one per key")
      assert(keys <= msgs)
      // at least one message per live row
      assert(amp >= 1000000L)
    }
    // the erase mix guarantees real amplification somewhere
    assert(rows.exists(_._5 > 0))
  }
}
