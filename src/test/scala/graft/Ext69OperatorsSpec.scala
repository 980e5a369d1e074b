package graft

import graft.operators.Ext69Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the ACF-spectrum / bottom-k-sample batch. */
class Ext69OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("acf: full 7-lag spectrum per type, |acf| <= 1e6, floor " +
    "replay from the daily lattice") {
    val got = Ext69Queries.acf(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val types = got.map(_._1).distinct
    types.foreach { t =>
      assert(got.filter(_._1 == t).map(_._2).sorted.toSeq === (1L to 7L),
        s"type $t spectrum")
    }
    got.foreach { case (t, l, np, num, den, acf) =>
      assert(den > 0L, s"$t den")
      assert(acf <= 1000000L && acf >= -1000001L, s"$t lag $l range")
      // the signed floor identity
      val bd = BigInt(num) * 1000000
      val r = ((bd mod BigInt(den)) + den) mod BigInt(den)
      val fl = (bd - r) / den
      assert(BigInt(acf) === fl, s"$t lag $l floor div")
    }
    // floor replay of one type's lattice end-to-end
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val t0 = got.head._1
    val daily = ev.filter(_._1 == t0).groupBy(_._2).view
      .mapValues { rs =>
        val s = rs.map(_._3).sum; val n = rs.length
        (s - (((s % n) + n) % n)) / n
      }.toMap
    val ms = daily.values.toSeq
    val mbar = { val s = ms.sum; val n = ms.size
      (s - (((s % n) + n) % n)) / n }
    val c = daily.view.mapValues(_ - mbar).toMap
    val den0 = c.values.map(v => v * v).sum
    (1L to 7L).foreach { l =>
      val num0 = c.collect {
        case (d, v) if c.contains(d + l) => v * c(d + l) }.sum
      val row = got.find(r => r._1 == t0 && r._2 == l).get
      assert(row._4 === num0, s"lag $l num")
      assert(row._5 === den0, s"lag $l den")
    }
  }

  test("bottom-k sample: fixed size R, and MERGEABLE — bottom-k of " +
    "per-shard bottom-k's equals the global sample (KMV identity)") {
    val got = Ext69Queries.bottomkSample(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === Ext69Queries.SampleR)
    assert(got.map(_._1).toSeq === (1L to Ext69Queries.SampleR))
    // hashes strictly increasing (md5 over distinct ids — collisions
    // at 60 bits would be astronomical)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
    // merge law: shard by doc_id % 4, take bottom-R per shard, merge,
    // take bottom-R of the union — must equal the global sample
    val all = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        Ext69Queries.mwRank(col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val shardTops = (0 until 4).flatMap { s =>
      all.filter(_._1 % 4 == s).sortBy(p => (p._2, p._1))
        .take(Ext69Queries.SampleR)
    }
    val merged = shardTops.sortBy(p => (p._2, p._1))
      .take(Ext69Queries.SampleR)
    assert(merged.map(_._1) === got.map(_._2).toSeq,
      "per-shard bottom-k merge must reproduce the global sample")
  }
}
