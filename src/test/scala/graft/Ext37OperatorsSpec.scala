package graft

import graft.Tables.t
import graft.operators.{Ext37Queries, NearDupGraph, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the OOV-curve / inversions / conductance batch. */
class Ext37OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("oov curve: driver replay and monotone decline") {
    val toks = t(spark, TestSpark.sfDir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .collect().map(_.getString(0).toLowerCase)
    val freq = toks.groupBy(identity).map { case (t0, g) =>
      (t0, g.length.toLong)
    }.toSeq
    val ranked = freq.sortBy { case (t0, n) => (-n, t0) }
    val totalOcc = freq.map(_._2).sum
    val rows = Ext37Queries.oovCurve(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === Seq(50L, 100L, 200L))
    rows.foreach { case (k, tOcc, tTypes, oovOcc, oovTypes, rate) =>
      assert(tOcc === totalOcc)
      assert(tTypes === freq.length.toLong)
      val expOov = ranked.drop(k.toInt).map(_._2).sum
      assert(oovOcc === expOov, s"oov occurrences at k=$k")
      assert(oovTypes === math.max(freq.length - k, 0L))
      assert(rate === expOov * 1000000L / totalOcc)
    }
    // more vocab -> fewer OOV
    assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-_).toSeq)
  }

  test("order inversions: driver replay per partition") {
    val ev = t(spark, TestSpark.sfDir, "events")
      .select((col("user_id") % 32).as("p"), col("event_id"),
        expr("cast(ts div 1000 as bigint)").as("tm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = Ext37Queries.orderInversions(spark, TestSpark.sfDir)
      .collect()
    val byP = ev.groupBy(_._1)
    assert(rows.map(_.getLong(0)).toSet === byP.keySet)
    rows.foreach { r =>
      val p = r.getLong(0)
      val seq0 = byP(p).sortBy(_._2).map(_._3).toSeq
      val invs = seq0.sliding(2).count {
        case Seq(a, b) => b < a
        case _ => false
      }
      val backs = seq0.sliding(2).collect {
        case Seq(a, b) if b < a => a - b
      }.toSeq
      assert(r.getLong(1) === seq0.length.toLong)
      assert(r.getLong(2) === invs.toLong, s"partition $p inversions")
      assert(r.getLong(3) === (if (backs.isEmpty) 0L else backs.max))
      assert(r.getLong(4) === backs.sum)
      assert(r.getLong(5) === invs.toLong * 1000000L /
        math.max(seq0.length - 1L, 1L))
    }
    // arrival order in the fixture is ts-sorted per event_id — the
    // fixture generates ids in time order, so inversions ~ 0; the
    // audit must agree rather than hallucinate disorder
    assert(rows.map(_.getLong(2)).sum ===
      ev.groupBy(_._1).map { case (_, g) =>
        g.sortBy(_._2).map(_._3).toSeq.sliding(2).count {
          case Seq(a, b) => b < a
          case _ => false
        }
      }.sum.toLong)
  }

  test("conductance: edge accounting identities over the LPA " +
    "partition") {
    val rows = Ext37Queries.conductance(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    // the edge universe: one row per undirected cust-supp edge
    val nEdges = t(spark, TestSpark.sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, TestSpark.sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    // every edge endpoint lands in exactly one community's volume
    assert(rows.map(_._5).sum === 2 * nEdges)
    // internal edges count once, cut edges once per side
    assert(rows.map(_._3).sum + rows.map(_._4).sum / 2 === nEdges)
    rows.foreach { case (_, members, internal, cut, vol, phi) =>
      assert(vol === 2 * internal + cut,
        "volume = 2*internal + cut per community")
      assert(members >= 1)
      phi.foreach(p => assert(p >= 0 && p <= 1000000L))
    }
    // LPA labels must be checked against the labelProp query itself:
    // community member counts agree
    val lpa = graft.operators.Ext28Queries
      .labelProp(spark, TestSpark.sfDir)
      .select("label", "community_size").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (cluster, members, _, _, _, _) =>
      assert(lpa(cluster) === members, s"community $cluster size")
    }
    // unlike CC components, an LPA partition of a connected-ish
    // interaction graph has real cuts — the audit must see them
    assert(rows.map(_._4).sum > 0, "LPA cut edges expected")
  }
}
