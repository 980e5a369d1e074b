package graft

import graft.Tables.t
import graft.operators.{Dedup, Ext16Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the assoc-rules /
  * harmonic-centrality / dead-letter batch: a from-scratch Scala
  * replay of the rule arithmetic, a driver-side BFS replay of the
  * 3-ball ring construction, and the partition property of the
  * quarantine report (reasons cover the corpus exactly once).
  */
class Ext16OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("association rules match a from-scratch basket replay") {
    val ut = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byUser = ut.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val nUsers = byUser.size.toLong
    val nT = ut.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nAb = ut.flatMap { case (u, a) =>
      byUser(u).filter(_ != a).map(b => (a, b))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = nAb.toSeq.sortBy(_._1).map { case ((a, b), ab) =>
      (a, b, ab, ab * 1000000L / nUsers, ab * 1000000L / nT(a),
        ab * nUsers * 1000000L / (nT(a) * nT(b)))
    }
    val got = Ext16Queries.assocRules(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expect)
    assert(got.nonEmpty)
  }

  test("harmonic3 matches a driver-side BFS on the same edge set") {
    val pairs = Dedup.simhashNearDups(
      t(spark, TestSpark.sfDir, "documents"), "doc_id", "text",
      maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expect = adj.keys.toSeq.sorted.map { v =>
      val r1 = adj(v)
      val r2 = r1.flatMap(adj).diff(r1) - v
      val r3 = r2.flatMap(adj).diff(r1).diff(r2) - v
      (v, r1.size.toLong, r2.size.toLong, r3.size.toLong,
        r1.size * 1000000L + r2.size * 500000L + r3.size * 333333L)
    }
    val got = Ext16Queries.harmonic3(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect)
    assert(got.exists(_._3 > 0), "no distance-2 ring — vacuous fixture")
  }

  test("dead-letter reasons partition the corpus, every code present") {
    val total = t(spark, TestSpark.sfDir, "events").count()
    val rows = Ext16Queries.deadLetter(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._2).sum === total)
    val expected =
      Set("not_json", "no_key", "no_action", "bad_key_type", "ok")
    assert(rows.map(_._1).toSet === expected)
    // the mix puts 4 of 10 residues in quarantine
    val okCount = rows.find(_._1 == "ok").get._2
    assert(okCount * 10 >= total * 5, "quarantine unexpectedly large")
  }
}
