package graft

import graft.Tables.t
import graft.operators.Ext26Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the hot-keys / dow-hod batch: top-k ordering and
  * share arithmetic, matrix coverage and share conservation, and the
  * TakeOrderedAndProject plan property for the bounded heap.
  */
class Ext26OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hot keys: descending, shares exact, heap-planned top-k") {
    val df = Ext26Queries.hotKeys(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-10 must plan a bounded heap, not a global sort:\n$plan")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3)))
    assert(rows.length === 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    rows.foreach { case (_, n, ops, share) =>
      assert(ops >= 1 && ops <= 4)
      assert(share > 0)
      assert(n >= 1)
    }
  }

  test("dow/hod matrix: coverage, conservation, dow anchoring") {
    val rows = Ext26Queries.dowHodMatrix(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val total = t(spark, TestSpark.sfDir, "events").count()
    assert(rows.map(_._3).sum === total)
    rows.foreach { case (dow, hod, n, share) =>
      assert(dow >= 0 && dow <= 6)
      assert(hod >= 0 && hod <= 23)
      assert(share === n * 1000000L / total)
    }
    // 2024-01-01 (day 0) is a Monday: events on that date land in
    // dow 0 — replay one
    val jan1 = t(spark, TestSpark.sfDir, "events")
      .filter(expr(
        "datediff(timestamp_micros(ts div 1000), date'2024-01-01') = 0"))
      .count()
    if (jan1 > 0) assert(rows.exists(_._1 == 0))
  }
}
