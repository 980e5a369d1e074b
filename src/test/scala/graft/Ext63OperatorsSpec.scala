package graft

import graft.Tables.t
import graft.operators.Ext63Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the KS / map-functions batch. */
class Ext63OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ks: sweep replay — cross-multiplied ECDF gap, argmax support " +
    "point, micro normalization") {
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val s1 = ev.filter(_._1 <= mid).map(_._2)
    val s2 = ev.filter(_._1 > mid).map(_._2)
    val support = (s1 ++ s2).distinct.sorted
    var (c1, c2) = (0L, 0L)
    var best = (0L, 0L) // (gap, vm)
    support.foreach { v =>
      c1 += s1.count(_ == v); c2 += s2.count(_ == v)
      val gap = math.abs(c1 * s2.length - c2 * s1.length)
      if (gap > best._1) best = (gap, v)
    }
    val row = Ext63Queries.ksTest(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getLong(0) === s1.length.toLong)
    assert(row.getLong(1) === s2.length.toLong)
    assert(row.getLong(2) === best._2, "argmax support point")
    assert(row.getLong(3) === best._1, "scaled D")
    assert(row.getLong(4) ===
      best._1 * 1000000L / (s1.length.toLong * s2.length))
    assert(row.getLong(3) > 0)
  }

  test("map functions: the map lane preserves the relational answer") {
    val got = Ext63Queries.mapFunctions(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val ev = t(spark, TestSpark.sfDir, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val byType = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val big = byType.filter(_._2 * 1000 >= 5000)
      (u, byType.size.toLong, rows.length.toLong, big.size.toLong,
        big.values.map(_ * 1000).sum)
    }.sortBy(_._1)
    assert(got.toSeq === want)
    got.foreach(r => assert(r._5 % 1000 === 0))
  }
}
