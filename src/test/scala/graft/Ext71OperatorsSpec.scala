package graft

import graft.operators.{CdcQueries, Ext71Queries}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the snapshot-diff / language-drift batch. */
class Ext71OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("snapshot diff: classification is consistent with the payload " +
    "columns and the diff covers both snapshots' key sets") {
    val got = CdcQueries.snapshotDiff(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
    assert(got.nonEmpty)
    // keys unique in the report
    assert(got.map(_._1).distinct.length === got.length)
    got.foreach { case (k, status, et1, vm1, et2, vm2) =>
      status match {
        case "added" =>
          assert(et1 === "-" && vm1 === -1L, s"key $k added with T1")
        case "removed" =>
          assert(et2 === "-" && vm2 === -1L, s"key $k removed with T2")
        case "changed" =>
          assert(et1 != et2 || vm1 != vm2, s"key $k changed-equal")
        case "unchanged" =>
          assert(et1 === et2 && vm1 === vm2, s"key $k unchanged-diff")
        case other => fail(s"key $k unknown status $other")
      }
    }
    // between T1=max/4 and T2=max/2 a quarter of the changelog lands —
    // the fixture must show real movement plus at least one other
    // status class (added/removed need erase markers, which the full
    // stream carries; at sf0.001 "added" is the one that materializes)
    assert(got.exists(_._2 == "changed"), "no changed keys")
    assert(got.map(_._2).distinct.length >= 2,
      "diff collapsed to a single status class")
  }

  test("lang drift: every language present, cosines in (0, 1e6] " +
    "range sanity, and sensitive to the lattice (not all identical)") {
    val got = Ext71Queries.langDrift(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val langs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).sorted
    assert(got.map(_._1).toSeq === langs.toSeq)
    val total = Tables.t(spark, TestSpark.sfDir, "embeddings").count()
    assert(got.map(_._2).sum === total)
    got.foreach { case (l, n, cos) =>
      assert(n > 0L)
      assert(cos >= -1000000L && cos <= 1000000L, s"$l cosine range")
    }
    // centroids of random-ish subpopulations differ: the report must
    // not collapse to one value
    assert(got.map(_._3).distinct.length > 1, "drift report degenerate")
  }
}
