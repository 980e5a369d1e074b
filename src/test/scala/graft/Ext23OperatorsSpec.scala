package graft

import graft.Tables.t
import graft.operators.Ext23Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the tolerance-as-of /
  * script-runs batch: the tolerance contract against the unbounded
  * as-of, and run-length identities.
  */
class Ext23OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tolerance as-of: subset of unbounded as-of, age bounded") {
    val got = Ext23Queries.asofTolerance(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(5)))
    assert(got.nonEmpty)
    got.foreach { case (_, _, age) =>
      assert(age >= 0 && age <= 600L * 1000000L)
    }
    // against the unbounded planned as-of: wherever tolerance
    // matched, the unbounded join must pick the SAME view (the most
    // recent one); where it matched something older than the bound,
    // tolerance must have no row
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("vus"),
        col("event_id").as("vid"))
    val unbounded = graft.plans.PlannedAsOf.asofJoin(clicks, views,
        "user_id", "us", "vus", Seq("vid", "vus"))
      .collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) None
        else Some((r.getLong(3), r.getLong(4), r.getLong(2)))))
      .toMap
    val tolMap = got.map(g => g._1 -> g._2).toMap
    unbounded.foreach { case (click, m) =>
      m match {
        case Some((vid, vus, cus)) if cus - vus <= 600L * 1000000L =>
          assert(tolMap.get(click).contains(vid),
            s"click $click: tolerance must keep the in-bound match")
        case _ =>
          assert(!tolMap.contains(click),
            s"click $click: stale/no match must be dropped")
      }
    }
  }

  test("script runs: identities against a driver-side scan") {
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def cls(t: String): Char =
      if (t.matches("^[A-Za-z]+$")) 'a'
      else if (t.matches("^[0-9]+$")) 'd' else 'o'
    val expect = docs.map { case (id, text) =>
      val cs = text.trim.split("\\s+").toSeq.map(cls)
      val runs = cs.foldLeft(List.empty[(Char, Long)]) {
        case ((c, n) :: rest, x) if c == x => (c, n + 1) :: rest
        case (acc, x) => (x, 1L) :: acc
      }.reverse
      (id, cs.length.toLong, runs.length.toLong,
        runs.map(_._2).max,
        (runs.length - 1).toLong * 1000000L /
          math.max(cs.length - 1, 1).toLong)
    }.sortBy(_._1)
    val got = Ext23Queries.scriptRuns(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect.toSeq)
  }
}
