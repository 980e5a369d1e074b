package graft

import graft.operators.Ext77Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext77QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5FirstHexEven(s: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) >> 4) & 1) == 0
  }

  test("xcorr: lag-0 Pearson replays driver-side; lag window spans " +
      "both signs; r stays in [-1, 1]") {
    val rows = Ext77Queries.tsXcorr(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val lags = rows.map(_.getLong(0))
    assert(lags.contains(0L) && lags.exists(_ < 0) && lags.exists(_ > 0))
    rows.filterNot(_.isNullAt(7)).foreach { r =>
      val v = r.getDouble(7)
      assert(v >= -1.0 && v <= 1.0, s"lag ${r.getLong(0)}: r=$v")
    }
    // driver replay of the lag-0 moments and r
    val e = Tables.t(spark, TestSpark.sfDir, "events")
      .selectExpr("(ts div 1000) div 3600000000 as hr", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (ta, tb) = (e.map(_._2).min, e.map(_._2).max)
    val sa = e.filter(_._2 == ta).groupBy(_._1)
      .map { case (h, xs) => h -> xs.size.toLong }
    val sb = e.filter(_._2 == tb).groupBy(_._1)
      .map { case (h, xs) => h -> xs.size.toLong }
    val pairs = sa.keySet.intersect(sb.keySet).toSeq
      .map(h => (sa(h), sb(h)))
    val n = pairs.size.toLong
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val r0 = rows.find(_.getLong(0) == 0L).get
    assert(r0.getLong(1) === n)
    assert(r0.getLong(2) === sx)
    assert(r0.getLong(3) === sy)
    assert(r0.getLong(6) === sxy)
  }

  test("join-size sketch: estimators, median and the exact join " +
      "count replay driver-side; the estimate is in the AMS error " +
      "regime") {
    val row = Ext77Queries.sketchJoinSize(spark, TestSpark.sfDir)
      .head()
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byU = ev.groupBy(_._1).map { case (u, xs) =>
      u -> (xs.count(_._2 % 2 == 0).toLong,
        xs.count(_._2 % 2 == 1).toLong)
    }
    val exact = byU.values.map { case (a, b) => a * b }.sum
    val zs = (0 until 16).map { i =>
      val x = byU.map { case (u, (a, _)) =>
        if (md5FirstHexEven(s"ams:$i:$u")) a else -a }.sum
      val y = byU.map { case (u, (_, b)) =>
        if (md5FirstHexEven(s"ams:$i:$u")) b else -b }.sum
      (x * y, i)
    }.sortBy(identity)
    assert(row.getLong(0) === 16L)
    assert(row.getLong(1) === zs(7)._1)
    assert(row.getLong(2) === zs.head._1)
    assert(row.getLong(3) === zs.last._1)
    assert(row.getLong(4) === exact)
    assert(row.getLong(5) ===
      math.abs(zs(7)._1 - exact) * 1000000L / math.max(exact, 1L))
    // median-of-16 inner-product sketch: |est - exact| should sit well
    // inside sqrt(F2(a)F2(b)) — assert a generous multiple
    val f2a = byU.values.map { case (a, _) => a * a }.sum
    val f2b = byU.values.map { case (_, b) => b * b }.sum
    assert(math.abs(zs(7)._1 - exact).toDouble <=
      1.5 * math.sqrt(f2a.toDouble * f2b.toDouble),
      s"join-size estimate ${zs(7)._1} vs $exact out of regime")
  }
}
