package graft

import graft.Tables.t
import graft.operators.Ext48Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the QUALIFY / DISTINCT ON / fuzzy-match batch. */
class Ext48OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("qualify: rank-limit pushed into the window (WindowGroupLimit)" +
    " and per-customer top-3 exact") {
    val df = Ext48Queries.qualifyTopOrders(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rk<=3 must become a group limit before the shuffle")
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byCust = rows.groupBy(_._1)
    assert(byCust.values.forall(_.length <= 3))
    val orders = t(spark, TestSpark.sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byCust.foreach { case (ck, got) =>
      val want = orders(ck).sortBy(o => (-o._3, o._2)).take(3)
        .zipWithIndex.map { case (o, i) => (ck, o._2, o._3, i + 1L) }
      assert(got.sortBy(_._4).toSeq === want.toSeq, s"cust $ck")
    }
    assert(byCust.keySet === orders.keySet)
  }

  test("distinct_on: one row per user via a windowless hash agg, " +
    "matching the explicit latest-event recompute") {
    val df = Ext48Queries.distinctOn(spark, TestSpark.sfDir)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"),
      "argmax must be an aggregate, not a window sort")
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    val latest = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), expr("ts div 1000").as("tu"),
        col("event_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
      .groupBy(_._1).view
      .mapValues(_.maxBy(e => (e._2, e._3))).toMap
    rows.foreach { r =>
      val e = latest(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))
        === ((e._2, e._3, e._4, e._5)), s"user ${r.getLong(0)}")
    }
    assert(rows.length === latest.size)
  }

  test("fuzzy match: deletion-neighborhood blocking finds EXACTLY the " +
    "naive lev<=1 pair set, lev-1 neighbor planted") {
    val got = Ext48Queries.fuzzyMatch(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cs = t(spark, TestSpark.sfDir, "customer")
      .select(col("c_custkey"), substring(col("c_name"), 10, 9))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ss = t(spark, TestSpark.sfDir, "supplier")
      .select(col("s_suppkey"), substring(col("s_name"), 10, 9))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val naive = (for {
      (ck, cid) <- cs; (sk, sid) <- ss
      l = lev(cid, sid) if l <= 1
    } yield (ck, sk, l.toLong)).sortBy(p => (p._1, p._2))
    assert(got.toSeq === naive.toSeq,
      "blocked candidates must be complete AND exact for lev<=1")
    // supplier #0 vs customer #1 differ only in the last digit
    assert(got.contains((1L, 0L, 1L)), "planted lev-1 neighbor missing")
  }
}
