package graft

import graft.Tables.t
import graft.operators.Ext56Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the AR(1) diagnostics batch. */
class Ext56OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ar1: floor-lattice replay of demeaned moments and the " +
    "pmod-floor ratio") {
    def floorDiv(a: Long, b: Long): Long =
      (a - (((a % b) + b) % b)) / b
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view
      .mapValues { rs =>
        val s = rs.map(_._3).sum; floorDiv(s, rs.length)
      }.toMap
    val byType = daily.groupBy(_._1._1)
    val want = byType.toSeq.map { case (et, cells) =>
      val ms = cells.toSeq.map { case ((_, d), m) => (d, m) }.sortBy(_._1)
      val mbar = floorDiv(ms.map(_._2).sum, ms.length)
      val c = ms.map { case (d, m) => (d, m - mbar) }.toMap
      val pairs = c.keys.filter(d => c.contains(d - 1)).toSeq
      val sxy = pairs.map(d => c(d) * c(d - 1)).sum
      val sxx = pairs.map(d => c(d - 1) * c(d - 1)).sum
      (et, pairs.length.toLong, mbar, sxy, sxx,
        floorDiv(sxy * 1000000L, sxx))
    }.sortBy(_._1)
    val got = Ext56Queries.ar1Fit(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
    // a stationary noise-like series keeps |phi| well inside ±1
    got.foreach(r => assert(math.abs(r._6) < 1500000L, r._1))
  }
}
