package graft

import graft.Tables.t
import graft.operators.Ext22Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the stickiness /
  * incremental-dedup batch: the first-in-window decomposition against
  * a brute-force sliding DISTINCT, and directional banding against
  * the full pair search restricted to cross-parity pairs.
  */
class Ext22OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("stickiness MAU equals brute-force sliding distinct") {
    val ud = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Ext22Queries.stickiness(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (day, dau, mau, st) =>
      val bfDau = ud.count(_._2 == day).toLong
      val bfMau = ud.filter(p => p._2 >= day - 27 && p._2 <= day)
        .map(_._1).distinct.length.toLong
      assert(dau === bfDau)
      assert(mau === bfMau, s"day $day: $mau vs brute $bfMau")
      assert(dau <= mau)
      assert(st === dau * 1000000L / mau)
    }
  }

  test("incremental dedup == cross-parity subset of the pair search") {
    val pairs = graft.operators.ExtQueries
      .dedupMinhashLsh(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossPar = pairs.filter(p => (p._1 + p._2) % 2 == 1)
      .map { p =>
        if (p._1 % 2 == 1) (p._1, p._2, p._3) else (p._2, p._1, p._3)
      }
    val expectBest = crossPar.groupBy(_._1).map { case (bid, ms) =>
      val best = ms.minBy(m => (-m._3, m._2))
      bid -> ((ms.length.toLong, best._2,
        BigDecimal(best._3).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = Ext22Queries.dedupIncremental(spark, TestSpark.sfDir)
      .collect()
    assert(got.nonEmpty)
    val dups = got.filter(_.getBoolean(1))
    assert(dups.nonEmpty, "fixture must contain cross-parity near-dups")
    dups.foreach { r =>
      val (n, cid, j) = expectBest(r.getLong(0))
      assert(r.getLong(2) === n)
      assert(r.getLong(3) === cid)
      assert(math.abs(r.getDouble(4) - j) < 1e-9)
    }
    val dupIds = dups.map(_.getLong(0)).toSet
    assert(dupIds === expectBest.keySet)
    // output covers exactly the odd (batch) docs
    val odd = t(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") % 2 === 1).count()
    assert(got.length.toLong === odd)
    assert(got.forall(_.getLong(0) % 2 == 1))
  }
}
