package graft

import graft.operators.Ext73Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the truncation-loss batch. */
class Ext73OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("truncation loss: conservation and exact per-doc replay") {
    val got = Ext73Queries.truncationLoss(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val want = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, rs) =>
        val lost = rs.map(r => math.max(r._2 - 64L, 0L))
        (l, rs.length.toLong, lost.count(_ > 0).toLong,
          rs.map(_._2).sum, lost.sum)
      }
    got.foreach { case (l, nd, nt, tot, lost, micro) =>
      val w = want.find(_._1 == l).get
      assert((nd, nt, tot, lost) === ((w._2, w._3, w._4, w._5)),
        s"$l replay")
      assert(micro === lost * 1000000L / tot, s"$l share")
      assert(nt <= nd && lost < tot)
    }
    // the L=64 policy must bite but not devour (fixture median ~56)
    assert(got.map(_._3).sum > 0L, "no doc truncated — L too high")
    assert(got.map(_._3).sum < got.map(_._2).sum,
      "every doc truncated — L too low")
  }
}
