package graft

import graft.Tables.t
import graft.operators.Ext15Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the skyline / MAX-IVM /
  * PPR / SAX batch: brute-force dominance verification for the
  * skyline (the O(n²) definition vs the window formulation), proof
  * that the MAX-IVM refetch branch is actually exercised by the
  * fixture (a vacuously-safe delta would test nothing), teleport
  * floor + mass conservation for PPR, and the NTILE balance contract
  * for the SAX lettering.
  */
class Ext15OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("skyline matches the O(n²) dominance definition") {
    val parts = t(spark, TestSpark.sfDir, "part")
      .select(col("p_partkey"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("price_c"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def dominated(p: (Long, Int, Long)): Boolean = parts.exists { q =>
      q._1 != p._1 && q._2 >= p._2 && q._3 <= p._3 &&
        (q._2 > p._2 || q._3 < p._3)
    }
    val expect = parts.filterNot(dominated)
      .sortBy(p => (-p._2, p._1)).map(p => (p._1, p._2, p._3))
    val got = Ext15Queries.skyline(spark, TestSpark.sfDir)
      .select("p_partkey", "p_size", "price_c").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === expect.toSeq)
    assert(got.nonEmpty)
  }

  test("MAX-IVM equals full recompute AND the refetch branch fires") {
    val ev = t(spark, TestSpark.sfDir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("cast(round(value * 1000) as bigint)").as("vm"),
      (col("event_id") % 7 === 0).as("del"))
    val full = graft.operators.KeyedMerge
      .lww(ev, Seq("user_id"), "event_id")
      .filter(!col("del"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_live"), max("vm").as("max_vm"))
      .orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Ext15Queries.ivmMinMax(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === full.toSeq)
    // the delta must retract at least one group's stored max — else
    // the refetch branch (the whole point of MAX-IVM) went untested
    val liveBase = graft.operators.KeyedMerge
      .lww(ev.filter(col("event_id") % 5 =!= 4),
        Seq("user_id"), "event_id")
      .filter(!col("del"))
    val vOld = liveBase.groupBy("event_type")
      .agg(max("vm").as("max_vm"))
    val touched = ev.filter(col("event_id") % 5 === 4)
      .select("user_id").distinct()
    val tied = liveBase.join(touched, Seq("user_id"), "left_semi")
      .join(vOld, Seq("event_type"))
      .filter(col("vm") === col("max_vm"))
      .count()
    assert(tied > 0, "fixture never retracts a group max — vacuous")
  }

  test("PPR: teleport floor on seeds, global mass bound, propagation") {
    val rows = Ext15Queries.ppr(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(2), r.getLong(4)))
    assert(rows.nonEmpty)
    val seeds = rows.filter(_._2)
    assert(seeds.nonEmpty, "no seed node present in the edge set")
    val seedMicro = 1000000L / seeds.length
    rows.foreach { case (_, isSeed, rank) =>
      assert(rank >= 0)
      // every seed keeps at least its teleport share
      if (isSeed) assert(rank >= (15L * seedMicro) / 100)
    }
    // floor divisions only lose mass: total stays under one unit
    assert(rows.map(_._3).sum <= 1000000L)
    // damped mass must actually reach non-seeds through the graph
    assert(rows.exists(r => !r._2 && r._3 > 0))
  }

  test("SAX words: length matches segments, alphabet, NTILE balance") {
    val rows = Ext15Queries.paaSax(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSegs, word) =>
      assert(word.length.toLong === nSegs)
      assert(word.forall(c => c >= 'a' && c <= 'd'))
      // NTILE(4) balance: per-letter counts differ by at most one
      val counts = "abcd".map(c => word.count(_ == c))
      assert(counts.max - counts.filter(_ > 0).min <= 1)
      // all four quartiles appear once there are ≥ 4 segments
      if (nSegs >= 4) assert(counts.forall(_ > 0))
    }
  }
}
