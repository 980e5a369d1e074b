package graft

import graft.Tables.t
import graft.operators.{CdcQueries, Ext20Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the cohort-LTV /
  * packing-report / SCD2-audit batch: value conservation and
  * telescoping for LTV, the tight-packing proof for the bin report,
  * and the dimension invariants the audit exists to certify.
  */
class Ext20OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cohort LTV conserves value and telescopes per cohort") {
    val rows = Ext20Queries.cohortLtv(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val totalVm = t(spark, TestSpark.sfDir, "events")
      .agg(sum(expr("cast(round(value * 1000) as bigint)")))
      .head().getLong(0)
    assert(rows.map(_._5).sum === totalVm, "v_milli must conserve")
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // cum telescopes to the per-cohort sum
      assert(sorted.last._6 === cs.map(_._5).sum)
      // cum is the running sum of v_milli in offset order
      assert(sorted.scanLeft(0L)(_ + _._5).tail.toSeq ===
        sorted.map(_._6).toSeq)
      cs.foreach { c =>
        assert(c._3 <= c._4, "active members cannot exceed cohort size")
        assert(c._7 === c._6 * 1000 / c._4)
      }
    }
  }

  test("packing report proves tightness: interior bins exactly full") {
    val rows = Ext20Queries.packingReport(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val lastBin = rows.map(_._1).max
    // bins are a contiguous 0..last range (no holes in the stream)
    assert(rows.map(_._1).sorted.toSeq === (0L to lastBin).toSeq)
    rows.foreach { case (bin, nDocs, nTok, nSpan) =>
      if (bin < lastBin) assert(nTok === 256L,
        s"interior bin $bin under-filled: $nTok")
      assert(nTok <= 256L)
      assert(nSpan <= nDocs)
    }
    val effTotal = t(spark, TestSpark.sfDir, "documents")
      .select(greatest(size(graft.operators.TextAnalysis
        .tokens(col("text"))).cast("long"), lit(1L)).as("e"))
      .agg(sum("e")).head().getLong(0)
    assert(rows.map(_._3).sum === effTotal, "token mass must conserve")
  }

  test("SCD2 audit certifies the dimension invariants") {
    val r = CdcQueries.scd2Audit(spark, TestSpark.sfDir).head()
    val (users, intervals, current, overlaps, gaps, contiguous) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(overlaps === 0L, "SCD2 validity intervals may never overlap")
    assert(current <= users, "at most one current row per key")
    assert(gaps > 0L, "the erase mix must create holes")
    assert(intervals >= current + contiguous)
    // adjacency accounting: every non-last interval is a gap or
    // contiguous transition
    assert(gaps + contiguous === intervals - users +
      0L, "per user: n-1 transitions") // users == #last-intervals
  }
}
