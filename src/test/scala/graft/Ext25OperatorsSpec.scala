package graft

import graft.Tables.t
import graft.operators.Ext25Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the QTE / SRM batch:
  * sort-and-pick replay per arm, quantile monotonicity, and the SRM
  * closed form on the deterministic split.
  */
class Ext25OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("QTE replays from per-arm sorted values; quantiles monotone") {
    val vals = t(spark, TestSpark.sfDir, "events")
      .select((col("user_id") % 2).as("g"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def pick(g: Long, p: Int): Long = {
      val xs = vals.filter(_._1 == g).map(_._2).sorted
      xs((((xs.length - 1) * p) / 100).toInt)
    }
    val r = Ext25Queries.abQte(spark, TestSpark.sfDir).head()
    assert(r.getLong(0) === vals.count(_._1 == 0).toLong)
    assert(r.getLong(1) === vals.count(_._1 == 1).toLong)
    val cols = Seq((25, 2, 3), (50, 5, 6), (75, 8, 9), (90, 11, 12))
    cols.foreach { case (p, ia, ib) =>
      assert(r.getLong(ia) === pick(0, p), s"p$p arm A")
      assert(r.getLong(ib) === pick(1, p), s"p$p arm B")
    }
    // monotone within each arm
    assert(r.getLong(2) <= r.getLong(5) && r.getLong(5) <= r.getLong(8)
      && r.getLong(8) <= r.getLong(11))
    assert(r.getLong(3) <= r.getLong(6) && r.getLong(6) <= r.getLong(9)
      && r.getLong(9) <= r.getLong(12))
  }

  test("SRM closed form; deterministic 50/50 split passes the gate") {
    val r = Ext25Queries.srmCheck(spark, TestSpark.sfDir).head()
    val (na, nb, chi2, flag) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
    assert(chi2 === (na - nb) * (na - nb) * 1000000L / (na + nb))
    // a hash-deterministic 50/50 split on synthetic uniform ids must
    // not trip the 95% gate
    assert(!flag, s"SRM flagged on a fair split: $na vs $nb")
  }
}
