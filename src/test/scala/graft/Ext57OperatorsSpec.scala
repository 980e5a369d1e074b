package graft

import graft.operators.{Ext57Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the bootstrap-tail / Katz batch. */
class Ext57OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bootstrap-tail: the split is non-trivial, tail supersedes " +
    "bootstrap rows, and two-phase == one-phase") {
    val parsed = graft.operators.CdcQueries
      .parsedStored(spark, TestSpark.sfDir)
      .filter(col("op").isin("update", "update_newimage", "erase"))
      .select("event_id", "op", "user_id", "event_type", "value_milli")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), if (r.isNullAt(4)) 0L else r.getLong(4)))
    val s = parsed.map(_._1).max * 3 / 5
    val (bootRows, tailRows) = parsed.partition(_._1 <= s)
    assert(bootRows.nonEmpty && tailRows.nonEmpty, "split non-trivial")
    // some bootstrapped user must be superseded by the tail
    val bootUsers = bootRows.map(_._3).toSet
    assert(tailRows.exists(r => bootUsers(r._3)),
      "tail must touch bootstrapped keys")
    val onePhase = parsed.groupBy(_._3).view
      .mapValues(_.maxBy(_._1)).values
      .filter(_._2 != "erase")
      .map(r => (r._3, r._1, r._4.orNull, r._5))
      .toSeq.sortBy(_._1)
    val got = Ext57Queries.bootstrapTail(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    assert(got.toSeq === onePhase)
  }

  test("katz3: exact walk-count replay (16·A1 + 4·A²1 + A³1)") {
    val pairs = NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val p1 = nbrs.view.mapValues(_.length.toLong).toMap
    def step(p: Map[Long, Long]): Map[Long, Long] =
      nbrs.view.mapValues(_.map(p).sum).toMap
    val p2 = step(p1); val p3 = step(p2)
    val want = p1.keys.map(n =>
      (n, 16 * p1(n) + 4 * p2(n) + p3(n)))
      .toSeq.sortBy { case (n, k) => (-k, n) }.take(30)
    val got = Ext57Queries.katz3(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === want)
    // Katz must not be a pure degree ranking on a clustered graph:
    // equal-degree nodes are split by their neighbourhoods
    val byDeg = got.map { case (n, _) => p1(n) }
    assert(byDeg.distinct.length < byDeg.length
      || got.map(_._2).distinct.length > 1)
  }
}
