package graft

import graft.operators.Ext76Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext76QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val ev: Array[(Long, Long, Long)] =
    Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"),
        unix_timestamp(Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / 86400L, r.getLong(2)))

  test("event study: per-relday cells and the netted effect replay " +
      "driver-side") {
    val rows = Ext76Queries.eventStudy(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val in = ev.map { case (u, d, vm) => (u % 2, d - 19738L, vm) }
      .filter(x => x._2 >= -7 && x._2 <= 7)
    val pre = in.filter(_._2 < 0)
    val (pnA, psA) = (pre.count(_._1 == 0).toLong,
      pre.filter(_._1 == 0).map(_._3).sum)
    val (pnB, psB) = (pre.count(_._1 == 1).toLong,
      pre.filter(_._1 == 1).map(_._3).sum)
    assert(pnA > 0 && pnB > 0, "fixture needs a populated pre-window")
    rows.foreach { r =>
      val d = r.getLong(0)
      val mine = in.filter(_._2 == d)
      val (nA, sA) = (mine.count(_._1 == 0).toLong,
        mine.filter(_._1 == 0).map(_._3).sum)
      val (nB, sB) = (mine.count(_._1 == 1).toLong,
        mine.filter(_._1 == 1).map(_._3).sum)
      assert(r.getLong(1) === nA, s"n_a at relday $d")
      assert(r.getLong(2) === nB, s"n_b at relday $d")
      if (nA > 0 && nB > 0) {
        assert(r.getLong(3) === sA / nA)
        assert(r.getLong(4) === sB / nB)
        val eff = math.rint(((sB.toDouble / nB - sA.toDouble / nA) -
          (psB.toDouble / pnB - psA.toDouble / pnA)) * 1000).toLong
        assert(r.getLong(5) === eff, s"effect at relday $d")
      }
    }
    // relday keys are a contiguous-ish window around the cutover and
    // include both signs, or the curve tests nothing
    val ds = rows.map(_.getLong(0))
    assert(ds.exists(_ < 0) && ds.exists(_ >= 0))
  }

  test("uplift bins: bin assignment is pre-period only; one bin " +
      "replays exactly") {
    val rows = Ext76Queries.upliftBins(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val binOf = ev.filter(_._2 < 19738L).groupBy(_._1)
      .map { case (u, xs) => u -> math.min(xs.size / 8, 4).toLong }
    val post = ev.filter(_._2 >= 19738L)
      .filter(x => binOf.contains(x._1))
    rows.foreach { r =>
      val b = r.getLong(0)
      val mine = post.filter(x => binOf(x._1) == b)
      val (a, t) = (mine.filter(_._1 % 2 == 0), mine.filter(_._1 % 2 == 1))
      assert(r.getLong(1) === a.map(_._1).distinct.length.toLong)
      assert(r.getLong(2) === t.map(_._1).distinct.length.toLong)
      assert(r.getLong(3) === a.length.toLong)
      assert(r.getLong(4) === t.length.toLong)
      if (a.nonEmpty && t.nonEmpty) {
        val up = math.rint((t.map(_._3).sum.toDouble / t.length -
          a.map(_._3).sum.toDouble / a.length) * 1000).toLong
        assert(r.getLong(7) === up, s"uplift in bin $b")
      }
    }
  }

  test("chrF: precision/recall replay for the first pair; F1 is the " +
      "harmonic mean and symmetric numerators hold") {
    val rows = Ext76Queries.evalChrf(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    val texts = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def tgs(id: Long): Map[String, Long] = {
      val t = texts(id).trim.toLowerCase.replaceAll("\\s+", " ")
      if (t.length < 3) Map.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
        .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    }
    rows.foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
      val (p, q, f) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(p >= 0 && p <= 1 && q >= 0 && q <= 1 && f >= 0 && f <= 1)
      if (r.getLong(4) > 0) {
        // near-dup pairs should overlap heavily at the char level
        assert(f > 0.0)
      }
    }
    val r0 = rows.head
    val (ga, gb) = (tgs(r0.getLong(0)), tgs(r0.getLong(1)))
    val m = gb.map { case (g, c) => math.min(c, ga.getOrElse(g, 0L)) }
      .sum
    assert(r0.getLong(2) === ga.values.sum)
    assert(r0.getLong(3) === gb.values.sum)
    assert(r0.getLong(4) === m)
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(r0.getDouble(5) === r6(m.toDouble / gb.values.sum))
    assert(r0.getDouble(6) === r6(m.toDouble / ga.values.sum))
  }
}
