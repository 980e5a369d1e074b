package graft

import graft.Tables.t
import graft.operators.Ext34Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the power-analysis / winsorized-metrics batch. */
class Ext34OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("power analysis: closed-form replay and MDE monotonicity") {
    val vm = t(spark, TestSpark.sfDir, "events")
      .select(expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(_.getLong(0))
    val n = vm.length.toLong
    val s = vm.sum
    val q = vm.map(x => x * x).sum
    val variance = (n.toDouble * q - s.toDouble * s) /
      (n.toDouble * (n - 1))
    val mean = s.toDouble / n
    val rows = Ext34Queries.powerAnalysis(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 5L, 10L))
    rows.foreach { case (pct, deltaMilli, nArm, powered) =>
      val delta = mean * pct / 100.0
      val zsum = 1.959964 + 0.841621
      val expect = math.ceil(2.0 * zsum * zsum * variance /
        (delta * delta)).toLong
      assert(deltaMilli === math.round(delta))
      assert(nArm === expect, s"n per arm at MDE $pct%")
      assert(powered === (n >= expect * 2))
    }
    // smaller effects need more samples — strictly monotone
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 > b._3)
      case _ =>
    }
  }

  test("winsorized means: full driver replay per arm") {
    val ev = t(spark, TestSpark.sfDir, "events")
      .select((col("user_id") % 2).as("grp"), col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = Ext34Queries.abWinsorized(spark, TestSpark.sfDir)
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val g = r.getLong(0)
      val arm = ev.filter(_._1 == g).sortBy(e => (e._3, e._2))
      val n = arm.length
      val lo = arm(math.ceil(n * 0.05).toInt - 1)._3
      val hi = arm(math.ceil(n * 0.95).toInt - 1)._3
      val wvm = arm.map(e => math.min(math.max(e._3, lo), hi))
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === arm.map(_._3).sum / n)
      assert(r.getLong(3) === wvm.sum / n)
      assert(r.getLong(4) === arm.count(_._3 < lo).toLong)
      assert(r.getLong(5) === arm.count(_._3 > hi).toLong)
      assert(r.getLong(6) === lo)
      assert(r.getLong(7) === hi)
      // winsorization clamps ~5% each side
      assert(r.getLong(4) <= n / 20 + 1)
      assert(r.getLong(5) <= n / 20 + 1)
    }
  }
}
