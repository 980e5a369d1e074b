package graft

import graft.Tables.t
import graft.operators.{Ext47Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the modern-aggs / random-walk / co-occurrence
  * batch.
  */
class Ext47OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("modern aggs: count_if == filtered count, bool aggs match " +
    "min/max logic, max_by keys on the unique sequence") {
    val rows = Ext47Queries.modernAggs(spark, TestSpark.sfDir)
      .collect()
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"), col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val g = ev(r.getString(0))
      assert(r.getLong(1) === g.length)
      assert(r.getLong(2) === g.count(_._3 >= 250000L))
      assert(r.getBoolean(3) === g.forall(_._3 > 0))
      assert(r.getBoolean(4) === g.exists(_._3 >= 489000L))
      assert(r.getLong(5) === g.maxBy(_._2)._3, "max_by(vm, seq)")
      assert(r.getLong(6) === g.minBy(_._2)._3, "min_by(vm, seq)")
    }
  }

  test("random walks: every step follows an actual edge, the pick " +
    "is the hash-designated neighbor, deterministic across runs") {
    val rows = Ext47Queries.randomWalks(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val byWalk = rows.groupBy(_._1)
    assert(byWalk.nonEmpty)
    byWalk.foreach { case (w, steps) =>
      val path = steps.sortBy(_._2).map(_._3)
      assert(path.length === 5, s"walk $w incomplete")
      assert(path.head === w)
      path.sliding(2).zipWithIndex.foreach { case (Array(u, v), i) =>
        val adj = nbrs(u)
        assert(adj.contains(v), s"walk $w step ${i + 1} not an edge")
        // replay the hash pick
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"walk7:$u:${i + 1}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        def hx(p: Int) = "0123456789abcdef".indexOf(md(p)).toLong
        val idx = (hx(0) * 256 + hx(1) * 16 + hx(2)) % adj.length
        assert(v === adj(idx.toInt), s"walk $w step ${i + 1} pick")
      }
    }
    val again = Ext47Queries.randomWalks(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === again.toSeq)
  }

  test("cooccur: lift arithmetic exact, pairs ordered, and a " +
    "planted always-adjacent pair dominates") {
    val rows = Ext47Queries.windowCooccur(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "pair not canonical")
      assert(r.getLong(2) >= 5L)
    }
    val lifts = rows.map(_.getLong(5))
    assert(lifts.sliding(2).forall(p => p(1) <= p(0)),
      "not lift-ordered")
    // planted: tokens that ONLY appear together get maximal lift
    import spark.implicits._
    val df = (1 to 6).map(i => (i.toLong, "zzqa zzqb filler"))
      .toDF("doc_id", "text")
    val tok = df.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        lower(col("col")).as("w"))
    val probes = tok.select(col("doc_id"), col("w"),
      explode(array(col("pos") + 1, col("pos") + 2)).as("pos2"))
    val planted = probes
      .join(tok.select(col("doc_id"), col("pos").as("pos2"),
        col("w").as("w2")), Seq("doc_id", "pos2"))
      .filter(col("w") === "zzqa" && col("w2") === "zzqb")
      .count()
    assert(planted === 6L, "planted adjacency must pair exactly once per doc")
  }
}
