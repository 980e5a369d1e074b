package graft

import graft.Tables.t
import graft.operators.{Ext53Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Hadamard / power-partition batch. */
class Ext53OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hadamard: exact butterfly replay, c_0 = series total, and " +
    "Parseval over BigInt") {
    val got = Ext53Queries.hadamardEnergy(spark, TestSpark.sfDir)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2),
        r.getLong(3)))).toMap
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        (expr("cast(ts div 86400000000000 as bigint)") - 19723L)
          .as("tt"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "tt").agg(sum("vm").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val types = daily.map(_._1).distinct
    types.foreach { et =>
      val series = Array.fill(32)(0L)
      daily.filter(_._1 == et).foreach(d => series(d._2.toInt) = d._3)
      val coefs = (0 until 32).map { k =>
        (0 until 32).map { tt =>
          val s = if (java.lang.Long.bitCount(tt & k) % 2 == 0) 1L else -1L
          series(tt) * s
        }.sum
      }
      (0 until 32).foreach { k =>
        assert(got((et, k.toLong)) === ((coefs(k), math.abs(coefs(k)))),
          s"$et k=$k")
      }
      assert(coefs(0) === series.sum, "c_0 is the series total")
      val lhs = coefs.map(c => BigInt(c) * BigInt(c)).sum
      val rhs = BigInt(32) * series.map(v => BigInt(v) * BigInt(v)).sum
      assert(lhs === rhs, s"Parseval violated for $et")
    }
    assert(got.size === types.length * 32)
  }

  test("power partition: three-iteration sign replay from the " +
    "collected edge list, volumes and internal edges consistent") {
    val pairs = NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs ++ pairs.map(p => (p._2, p._1))
    val nbrs = und.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var x = nbrs.keys.map(n => n -> (if (n % 2 == 0) 1L else -1L)).toMap
    for (_ <- 1 to 3)
      x = x.map { case (n, v) => n -> (v + nbrs(n).map(x).sum) }
    val side = x.map { case (n, v) => n -> (if (v >= 0) 1L else -1L) }
    val wantRows = side.groupBy(_._2).map { case (s, ns) =>
      val members = ns.keySet
      val vol = members.toSeq.map(nbrs(_).length.toLong).sum
      val internal = und.count(e =>
        members(e._1) && members(e._2) && side(e._2) == s) / 2
      (s, members.size.toLong, vol, internal.toLong)
    }.toSeq.sortBy(_._1)
    val gotRows = Ext53Queries.powerPartition(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gotRows.toSeq === wantRows)
    assert(gotRows.map(_._3).sum === und.length.toLong,
      "total volume is 2|E|")
    gotRows.foreach(r => assert(r._4 * 2 <= r._3,
      "internal edges bounded by half the volume"))
  }
}
