package graft

import graft.operators.Ext80Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext80QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rolling corr: one day's windowed moments replay driver-side; " +
      "r stays in [-1, 1]") {
    val rows = Ext80Queries.rollingCorr(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.filterNot(_.isNullAt(7)).foreach { r =>
      val v = r.getDouble(7)
      assert(v >= -1.0 && v <= 1.0, s"day ${r.getLong(0)}: r=$v")
    }
    val e = Tables.t(spark, TestSpark.sfDir, "events")
      .selectExpr("(ts div 1000) div 86400000000 as day", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (ta, tb) = (e.map(_._2).min, e.map(_._2).max)
    val sa = e.filter(_._2 == ta).groupBy(_._1)
      .map { case (d, xs) => d -> xs.size.toLong }
    val sb = e.filter(_._2 == tb).groupBy(_._1)
      .map { case (d, xs) => d -> xs.size.toLong }
    val days = sa.keySet.intersect(sb.keySet)
    val last = rows.last
    val d0 = last.getLong(0)
    val win = days.filter(d => d >= d0 - 6 && d <= d0).toSeq
    assert(last.getLong(1) === win.size.toLong)
    assert(last.getLong(2) === win.map(sa).sum)
    assert(last.getLong(3) === win.map(sb).sum)
    assert(last.getLong(6) === win.map(d => sa(d) * sb(d)).sum)
    // enough days survive the n_win >= 4 floor to form a curve
    assert(rows.length >= 7)
  }

  test("PR average precision replays driver-side and sits in (0, 1]") {
    val row = Ext80Queries.evalAucPr(spark, TestSpark.sfDir).head()
    val s = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .selectExpr(
        "cast(round(cast(element_at(embedding, 1) as double)" +
          " * 1000000) as bigint) as score",
        "cast(label % 2 = 0 as long) as pos")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val levels = s.groupBy(_._1).toSeq
      .map { case (sc, xs) =>
        (sc, xs.size.toLong, xs.map(_._2).sum) }
      .sortBy(-_._1)
    var (tp, pred) = (0L, 0L)
    var termSum = 0L
    levels.foreach { case (_, cnt, cntPos) =>
      tp += cntPos; pred += cnt
      termSum += cntPos * ((tp * 1000000000L) / pred)
    }
    val nPos = s.map(_._2).sum
    assert(row.getLong(0) === nPos)
    assert(row.getLong(1) === s.length - nPos)
    assert(row.getLong(2) === termSum)
    assert(row.getLong(3) === termSum / nPos)
    // AP of a random-ish scorer on a balanced-ish fixture: strictly
    // positive, <= 1, and near the positive base rate
    assert(row.getLong(3) > 0L && row.getLong(3) <= 1000000000L)
    val baseRateNano = nPos * 1000000000L / s.length
    assert(math.abs(row.getLong(3) - baseRateNano) <
      baseRateNano, "AP wildly off the base-rate anchor")
  }
}
