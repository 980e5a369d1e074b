package graft

import graft.operators.Ext72Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Kaplan–Meier / schema-merge batch. */
class Ext72OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("KM: survival is monotone non-increasing, at-risk counts " +
    "telescope, and the curve floor-replays the product limit") {
    val got = Ext72Queries.survivalKm(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // event times strictly increasing; km non-increasing in (0, 1e6]
    assert(got.map(_._1).toSeq === got.map(_._1).sorted.toSeq)
    assert(got.map(_._4).toSeq === got.map(_._4).sortBy(-_).toSeq,
      "KM must never rise")
    got.foreach { case (t, n, d, km) =>
      assert(d > 0L && d <= n, s"t=$t events vs at-risk")
      assert(km > 0L || n == d, s"t=$t km positive unless all die")
      assert(km <= 1000000L)
    }
    // at-risk never increases with t (people only leave the risk set)
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    // exact product-limit replay
    var km = 1000000L
    got.foreach { case (t, n, d, g) =>
      km = km * (n - d) / n
      assert(g === km, s"t=$t product limit")
    }
    // fixture must show real attrition (curve strictly below 1)
    assert(got.last._4 < 1000000L)
  }

  test("schema merge: both generations align by name — old rows " +
    "carry null score, totals match the parquet source") {
    val got = Ext72Queries.schemaMerge(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = Tables.t(spark, TestSpark.sfDir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 1000) as bigint)")).as("s"),
        sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L))
          .as("g1"),
        sum(when(col("event_id") % 2 === 1, col("event_id") % 97)
          .otherwise(0L)).as("sc"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want.toSeq)
    // both generations genuinely present
    assert(got.map(_._4).sum > 0L, "no gen1 rows")
    assert(got.map(_._2).sum > got.map(_._4).sum, "no gen2 rows")
  }
}
