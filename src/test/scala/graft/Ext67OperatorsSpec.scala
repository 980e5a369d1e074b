package graft

import graft.operators.{Ext67Queries, NearDupGraph}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the retention-matrix / n-gram-novelty batch. */
class Ext67OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("retention: age-0 share is exactly 1e6, shares never exceed " +
    "it, matrix is a triangle") {
    val got = Ext67Queries.retentionMatrix(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.nonEmpty)
    got.filter(_._2 == 0L).foreach { r =>
      assert(r._3 === r._4, s"cohort ${r._1} size row")
      assert(r._5 === 1000000L, s"cohort ${r._1} age-0 share")
    }
    got.foreach { r =>
      assert(r._2 >= 0L && r._3 <= r._4,
        s"cohort ${r._1} age ${r._2}: active ${r._3} > size ${r._4}")
      assert(r._5 === r._3 * 1000000L / r._4)
    }
    // triangle: a cohort born in week w has ages only up to maxW - w
    val maxW = got.map(r => r._1 + r._2).max
    got.foreach(r => assert(r._1 + r._2 <= maxW))
    // the fixture must exercise real churn somewhere
    assert(got.exists(r => r._2 > 0L && r._3 < r._4),
      "fixture must have a cohort that lost at least one user")
  }

  test("novelty: totals conserve (every shingle owned once) and the " +
    "per-doc report floor-replays from the stored shingle table") {
    val got = Ext67Queries.ngramNovelty(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sh = NearDupGraph.shingleTable(spark, TestSpark.sfDir)
    // conservation: sum of novel == number of distinct shingles
    val nShingles = sh.select("shingle").distinct().count()
    assert(got.map(_._3).sum === nShingles)
    // every doc row present; novelty share in [0, 1e6] and exact
    got.foreach { case (d, n, novel, micro) =>
      assert(novel <= n, s"doc $d")
      assert(micro === (if (n == 0) 0L else novel * 1000000L / n),
        s"doc $d share")
    }
    // full floor replay: recompute ownership driver-side from the
    // stored shingle table and require row-exact agreement
    val pairs = sh.collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val owner = pairs.groupBy(_._2).view.mapValues(_.map(_._1).min)
    val want = pairs.groupBy(_._1).map { case (d, ps) =>
      val n = ps.length.toLong
      val novel = ps.count(p => owner(p._2) == d).toLong
      d -> ((n, novel, novel * 1000000L / n))
    }
    got.foreach { case (d, n, novel, micro) =>
      assert((n, novel, micro) === (want.get(d) match {
        case Some(w) => w
        case None => (0L, 0L, 0L)
      }), s"doc $d floor replay")
    }
    // the fixture must exercise the interesting middle: docs that are
    // neither all-novel nor zero-novel
    assert(got.exists(r => r._3 > 0L && r._3 < r._2),
      "fixture must have partially-novel docs")
    assert(got.exists(r => r._2 > 0L && r._3 == 0L),
      "fixture must have zero-novelty docs with shingles")
  }
}
