package graft

import graft.Tables.t
import graft.operators.{Ext26Queries, Ext31Queries, KeyedMerge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the moment-IVM / window-curve / sequential batch. */
class Ext31OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ivm moments: incremental == native full recompute") {
    val ev = t(spark, TestSpark.sfDir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      round(col("value") * 1000).cast("long").as("vm"),
      (col("event_id") % 7 === 0).as("del"))
    val full = KeyedMerge.lww(ev, Seq("user_id"), "event_id")
      .filter(!col("del"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum("vm").as("s_milli"),
        sum(col("vm") * col("vm")).as("q_milli2"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val rows = Ext31Queries.ivmMoments(spark, TestSpark.sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSet === full.keySet)
    rows.foreach { r =>
      val et = r.getString(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === full(et),
        s"moments for $et")
      val (n, s, q) = full(et)
      // Cauchy–Schwarz: n*q >= s^2, so variance >= 0
      assert(BigInt(n) * BigInt(q) >= BigInt(s) * BigInt(s))
      if (n >= 2) {
        val v = r.getDouble(4)
        val expect = (n.toDouble * q - s.toDouble * s) /
          (n.toDouble * (n - 1))
        assert(math.abs(v - BigDecimal(expect)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
          < 1e-9)
        assert(v >= 0.0)
      }
    }
  }

  test("attrib window curve: monotone, and the 600s point equals " +
    "ev_attrib_coverage") {
    val r = Ext31Queries.attribWindowCurve(spark, TestSpark.sfDir)
      .collect().head
    val n = r.getLong(0)
    val cov = Map(60 -> r.getLong(1), 300 -> r.getLong(3),
      600 -> r.getLong(5), 1800 -> r.getLong(7))
    assert(cov(60) <= cov(300) && cov(300) <= cov(600) &&
      cov(600) <= cov(1800) && cov(1800) <= n)
    Seq((60, 2), (300, 4), (600, 6), (1800, 8)).foreach {
      case (w, idx) =>
        assert(r.getLong(idx) === cov(w) * 1000000L / n, s"rate @$w")
    }
    val covRow = Ext26Queries.attribCoverage(spark, TestSpark.sfDir)
      .collect().head
    assert(covRow.getLong(0) === n, "same conversion denominator")
    assert(covRow.getLong(1) === cov(600),
      "600s curve point == coverage n_touched")
  }

  test("sequential z: driver replay of the final day and crossing " +
    "uniqueness") {
    val rows = Ext31Queries.abSequential(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    // monotone cumulative sample sizes
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 >= a._2 && b._3 >= a._3)
      case _ =>
    }
    // at most one first-crossing, and it is the earliest crossed day
    val firsts = rows.filter(_._6)
    assert(firsts.length <= 1)
    val crossedDays = rows.filter(_._5).map(_._1)
    if (crossedDays.nonEmpty)
      assert(firsts.head._1 === crossedDays.min)
    else assert(firsts.isEmpty)
    // replay the last day's z from raw events
    val ev = t(spark, TestSpark.sfDir, "events")
      .select((col("user_id") % 2).as("g"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def mom(g: Long) = {
      val v = ev.filter(_._1 == g).map(_._2)
      (v.length.toLong, v.sum, v.map(x => x * x).sum)
    }
    val (na, sa, qa) = mom(0); val (nb, sb, qb) = mom(1)
    val va = (na.toDouble * qa - sa.toDouble * sa) /
      (na.toDouble * (na - 1))
    val vb = (nb.toDouble * qb - sb.toDouble * sb) /
      (nb.toDouble * (nb - 1))
    val z = (sb.toDouble / nb - sa.toDouble / na) /
      math.sqrt(va / na + vb / nb)
    assert(rows.last._4 === math.round(z * 1000))
  }
}
