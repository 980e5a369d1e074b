package graft

import graft.Tables.t
import graft.operators.{Ext14Queries, Ext21Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the histogram /
  * fertility / keyframe batch: the sketch's bracket guarantee against
  * the exact percentile, shard-merge associativity, fertility lattice
  * identities, and keyframe membership in its own shot.
  */
class Ext21OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("histogram brackets contain the exact percentiles; merge is " +
      "shard-order invariant") {
    val vms = t(spark, TestSpark.sfDir, "events")
      .select(expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(_.getLong(0)).sorted
    val r = Ext21Queries.sketchHistogram(spark, TestSpark.sfDir).head()
    assert(r.getLong(0) === vms.length.toLong)
    def exact(p: Int): Long = {
      // smallest value with cum*100 >= total*p — the sketch's rule
      // applied to the raw data
      val idx = vms.indices.find(i => (i + 1) * 100L >= vms.length.toLong * p).get
      vms(idx)
    }
    for ((p, lo, hi) <- Seq((50, 1, 2), (90, 3, 4), (99, 5, 6))) {
      val (l, h) = (r.getLong(lo), r.getLong(hi))
      val e = exact(p)
      assert(l <= e && e < h || (e >= 63 * 5200L && l == 63 * 5200L),
        s"p$p exact $e outside bracket [$l,$h)")
    }
  }

  test("fertility: lattice identities and subtoken >= word counts") {
    val rows = Ext21Queries.tokFertility(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, words, subs, chars, fert, cps) =>
      assert(nDocs > 0)
      assert(subs >= words, "BPE-ish splits never merge words")
      assert(fert === subs * 1000000L / words)
      assert(cps === chars * 1000000L / subs)
      assert(fert >= 1000000L)
    }
  }

  test("keyframes: one per shot, inside its shot, energy is the max") {
    val shots = Ext14Queries.shotBoundaries(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3))))
      .toMap
    val keys = Ext21Queries.keyframes(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(keys.length === shots.size, "exactly one keyframe per shot")
    keys.foreach { case (m, seg, kf, _, _) =>
      val (s, e) = shots((m, seg))
      assert(kf >= s && kf <= e, "keyframe must lie inside its shot")
    }
  }
}
