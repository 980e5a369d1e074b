package graft

import graft.Tables.t
import graft.operators.{CdcQueries, Ext19Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the backtest /
  * bot-screen / redelivery batch: a driver-side replay of the
  * seasonal-naive metrics, the flag-definition replay for gap
  * moments, and redelivery arithmetic + LWW idempotence.
  */
class Ext19OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("seasonal-naive backtest metrics replayed from the day lattice") {
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day").agg(sum("vm").as("v"))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2)))
      .toMap
    val expect = daily.keys.map(_._1).toSeq.distinct.sorted.map { et =>
      val pairs = daily.collect {
        case ((`et`, d), v) if daily.contains((et, d - 7)) =>
          (v, daily((et, d - 7)))
      }.toSeq
      val n = pairs.length.toLong
      (et, n,
        pairs.map(p => math.abs(p._1 - p._2)).sum / n,
        pairs.map(p => math.abs(p._1 - p._2) * 1000000L / p._1).sum / n,
        pairs.map(p => p._1 - p._2).sum)
    }
    val got = Ext19Queries.backtestSnaive(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expect)
    assert(got.forall(_._2 > 0))
  }

  test("bot flags replay from per-user gap moments") {
    val evs = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("tsec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val thr = 3600L * 3600L
    val expect = evs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (u, rows) =>
        val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
        val gaps = ts.zip(ts.drop(1)).map(p => p._2 - p._1)
        val m = gaps.length.toLong
        val s = gaps.sum
        val q = gaps.map(g => g * g).sum
        val reg = m >= 5 && m * q - s * s < thr * m * (m - 1)
        (u, rows.length.toLong, s, q, reg, reg && rows.length >= 10)
    }
    val got = Ext19Queries.botUsers(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(got.toSeq === expect)
    got.foreach { g => if (g._6) assert(g._5) }
  }

  test("redelivery: dup counts exact and LWW apply is idempotent") {
    val rows = CdcQueries.redeliveryAudit(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, deliveries, unique, dup, share) =>
      assert(deliveries === unique + dup)
      assert(share === dup * 1000000L / deliveries)
      assert(dup >= 0)
    }
    assert(rows.map(_._4).sum > 0, "the % 11 slice must redeliver")
    // idempotence: LWW over a stream WITH duplicate deliveries equals
    // LWW over the deduplicated stream (exact duplicate rows cannot
    // change the per-key winner)
    import spark.implicits._
    val base = Seq((1L, 10L, "a"), (1L, 11L, "b"), (2L, 5L, "c"))
      .toDF("k", "seq", "v")
    val redelivered = base.unionByName(base.filter(col("seq") % 2 === 1))
    val a = graft.operators.KeyedMerge.lww(base, Seq("k"), "seq")
      .collect().map(_.toSeq).toSet
    val b = graft.operators.KeyedMerge.lww(redelivered, Seq("k"), "seq")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
