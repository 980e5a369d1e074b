package graft

import graft.Tables.t
import graft.operators.Ext66Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the LOCF gap-fill batch. */
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
}
