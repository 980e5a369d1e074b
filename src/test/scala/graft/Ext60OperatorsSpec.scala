package graft

import graft.Tables.t
import graft.operators.Ext60Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Haar-DWT / burstiness batch. */
class Ext60OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("haar: pyramid replay and the conservation identity " +
    "(level-3 approximations sum to the series total)") {
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        (expr("cast(ts div 86400000000000 as bigint)") - 19723L)
          .as("tt"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .filter(col("tt") >= 0 && col("tt") < 32)
      .groupBy("event_type", "tt").agg(sum("vm").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val types = daily.map(_._1).distinct.sorted
    val want = types.flatMap { et =>
      var series = daily.filter(_._1 == et).map(d => (d._2, d._3)).toMap
      (1 to 3).map { lv =>
        val byJ = series.groupBy(_._1 / 2)
        val a = byJ.view.mapValues(_.values.sum).toMap
        val d = byJ.view.mapValues(cells => cells.map { case (tt, v) =>
          if (tt % 2 == 0) v else -v
        }.sum).toMap
        val rep = (et, lv.toLong, d.size.toLong,
          d.values.map(math.abs).sum, d.values.map(math.abs).max)
        series = a
        rep
      }
    }.sortBy(r => (r._1, r._2))
    val got = Ext60Queries.haarDwt(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want)
    // conservation: unnormalized approximations preserve the total
    types.foreach { et =>
      val tot = daily.filter(_._1 == et).map(_._3).sum
      var series = daily.filter(_._1 == et).map(d => (d._2, d._3)).toMap
      for (_ <- 1 to 3)
        series = series.groupBy(_._1 / 2).view
          .mapValues(_.values.sum).toMap
      assert(series.values.sum === tot, s"$et total not conserved")
    }
  }

  test("burstiness: replay, every reported word bursty-or-even with " +
    "burst >= 1e6 by construction") {
    val got = Ext60Queries.wordBurstiness(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val tok = t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .map(w => (r.getLong(0), w.toLowerCase)))
    val want = tok.groupBy(_._2).view.mapValues { occ =>
      (occ.map(_._1).distinct.length.toLong, occ.length.toLong)
    }.toMap.toSeq
      .collect { case (w, (nd, no)) if no >= 20 =>
        (w, nd, no, no * 1000000L / nd)
      }
      .sortBy { case (w, _, _, b) => (-b, w) }.take(40)
    assert(got.toSeq === want)
    got.foreach(r => assert(r._4 >= 1000000L,
      "occurrences >= containing docs by definition"))
    assert(got.nonEmpty)
  }
}
