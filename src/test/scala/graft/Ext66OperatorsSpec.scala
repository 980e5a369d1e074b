package graft

import graft.Tables.t
import graft.operators.Ext66Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the LOCF gap-fill / Benford batch. */
class Ext66OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("locf: dense lattice, floor replay of the carry, staleness " +
    "counts days since observation") {
    val got = Ext66Queries.locfFill(spark, TestSpark.sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // dense spine: every series covers the identical full day range
    val byS = got.groupBy(_._1)
    val ranges = byS.values.map(rs =>
      (rs.map(_._2).min, rs.map(_._2).max, rs.length)).toSet
    assert(ranges.size === 1, "all series share the full day range")
    // the fixture must exercise BOTH cell kinds
    assert(got.exists(_._3 == 1L), "fixture must have gap cells")
    assert(got.exists(_._3 == 0L), "fixture must have observed cells")
    // floor replay per series: carry = last observed value; staleness
    // = days since; -1 sentinels before the first observation
    byS.foreach { case (s, rs) =>
      var lastV = -1L; var lastD = -1L
      rs.sortBy(_._2).foreach { case (_, day, isGap, vFill, stale) =>
        if (isGap == 0L) { lastV = vFill; lastD = day }
        assert(vFill === lastV, s"$s day $day carry")
        assert(stale === (if (lastD < 0) -1L else day - lastD),
          s"$s day $day staleness")
      }
    }
  }

  test("benford: 9-digit spine, shares sum to ~1e6, constants exact") {
    val got = Ext66Queries.benford(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).toSeq === (1L to 9L))
    assert(got.map(_._4).sum === 1000000L,
      "expected-share constants must sum to exactly 1e6")
    // observed shares sum to 1e6 within the 9-cell floor-division slack
    val s = got.map(_._3).sum
    assert(s > 1000000L - 9 && s <= 1000000L, s"share sum $s")
    // floor replay of counts and deviations
    val vms = t(spark, TestSpark.sfDir, "events")
      .select(expr("cast(round(value * 1000) as bigint)").as("vm"))
      .filter(col("vm") > 0).collect().map(_.getLong(0))
    val n = vms.length.toLong
    val want = vms.groupBy(v => v.toString.take(1).toLong)
      .view.mapValues(_.length.toLong).toMap
    got.foreach { case (d, cnt, share, bf, dev) =>
      assert(cnt === want.getOrElse(d, 0L), s"digit $d count")
      assert(share === cnt * 1000000L / n, s"digit $d share")
      assert(dev === math.abs(share - bf), s"digit $d deviation")
    }
  }
}
