package graft

import graft.operators.Ext67Queries
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the retention-matrix batch. */
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
}
