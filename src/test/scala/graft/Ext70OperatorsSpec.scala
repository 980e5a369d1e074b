package graft

import graft.operators.Ext70Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the mix-weights / pass@k batch. */
class Ext70OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mix weights: downsample-only (<= 1), over-represented langs " +
    "get weight < 1, kept counts approach the uniform target") {
    val got = Ext70Queries.mixWeights(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length >= 3)
    val total = got.map(_._2).sum
    val target = 1000000L / got.length
    got.foreach { case (lang, cnt, actual, tgt, w, kept) =>
      assert(tgt === target)
      assert(actual === cnt * 1000000L / total)
      assert(w <= 1000000L, s"$lang duplicates")
      assert(kept === cnt * w / 1000000L)
      // over-represented -> strictly downsampled
      if (actual > tgt) assert(w < 1000000L, s"$lang not downsampled")
      // under-represented -> untouched (cap binds)
      if (actual < tgt) assert(w === 1000000L, s"$lang upsampled")
      // post-sampling share lands at or below target (floor effects)
      assert(kept * got.length <= total + got.length,
        s"$lang kept $kept overshoots uniform")
    }
    assert(got.exists(_._5 < 1000000L),
      "fixture must have an over-represented language")
  }

  test("pass@k: monotone in k, brackets the pass rate, and floor-" +
    "replays the exact combinatorial estimator") {
    val got = Ext70Queries.passAtK(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    val byTask = got.groupBy(_._1)
    byTask.foreach { case (task, rs) =>
      val ks = rs.sortBy(_._4)
      // pass@k is non-decreasing in k (more chances, never fewer)
      assert(ks.map(_._5).toSeq === ks.map(_._5).sorted.toSeq,
        s"task $task monotonicity")
      val (n, c) = (ks.head._2, ks.head._3)
      ks.foreach { case (_, _, _, k, micro) =>
        assert(k <= n)
        // exact replay: 1e6 - floor(prod(n-c-j)/prod(n-j) * 1e6)
        val num = (0L until k).map(j => n - c - j).product
        val den = (0L until k).map(j => n - j).product
        val want =
          if (c >= n || n - c < k) 1000000L
          else 1000000L - num * 1000000L / den
        assert(micro === want, s"task $task k=$k")
        // pass@1 floor = floor(c/n); pass@k <= 1
        assert(micro >= 0L && micro <= 1000000L)
      }
      // pass@1 = 1e6 - floor((n-c)e6/n), i.e. ceil(c*1e6/n)
      assert(ks.head._5 === (if (c >= n) 1000000L
        else 1000000L - (n - c) * 1000000L / n),
        s"task $task pass@1")
    }
    // fixture must have partial passers (not all 0 or 1e6)
    assert(got.exists(r => r._5 > 0L && r._5 < 1000000L))
  }
}
