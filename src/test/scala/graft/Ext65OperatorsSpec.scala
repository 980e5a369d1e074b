package graft

import graft.Tables.t
import graft.operators.Ext65Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the schema-compat / shrinkage batch. */
class Ext65OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("schema compat: v0->v1 is backward (addition only), v1->v2 is " +
    "breaking (adds tags, drops event_type)") {
    val rows = Ext65Queries.schemaCompat(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.length === 2)
    assert(rows(0) === ((0L, 1L, 1L, 0L, "backward")),
      "v1 only adds score_milli")
    assert(rows(1) === ((1L, 2L, 1L, 1L, "breaking")),
      "v2 adds tags AND removes event_type")
  }

  test("shrinkage: floor replay; shrunk estimate lies between the " +
    "raw mean and the prior, tighter for small n") {
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mu = ev.map(_._2).sum * 1000 / ev.length
    val want = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
      val n = rs.length.toLong; val s = rs.map(_._2).sum
      (u, n, s * 1000 / n, (s * 1000 + 20 * mu) / (n + 20), mu)
    }.sortBy(_._1)
    val got = Ext65Queries.ebShrinkage(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === want)
    got.foreach { case (u, n, raw, shrunk, m) =>
      val (lo, hi) = (math.min(raw, m), math.max(raw, m))
      assert(shrunk >= lo - 1 && shrunk <= hi + 1,
        s"user $u shrunk outside [raw, prior]")
    }
    // shrinkage strength decreases with n: the max |raw - shrunk|
    // among high-n users stays below the max among low-n users
    // (when both groups exist and raws differ from the prior)
    val byN = got.map(r => (r._2, math.abs(r._3 - r._4)))
    val lowN = byN.filter(_._1 <= 5).map(_._2)
    val highN = byN.filter(_._1 >= 50).map(_._2)
    if (lowN.nonEmpty && highN.nonEmpty)
      assert(highN.max <= math.max(lowN.max, 1L) * 3,
        "high-n users must not shrink more than small-n users do")
  }
}
