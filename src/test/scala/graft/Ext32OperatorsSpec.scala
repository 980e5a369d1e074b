package graft

import graft.Tables.t
import graft.operators.{Ext30Queries, Ext32Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the threshold-sweep / change-point / curate3 batch. */
class Ext32OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("threshold sweep: monotone decreasing, t=1 equals the full " +
    "pair table") {
    val rows = Ext32Queries.thresholdSweep(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "pair count non-increasing in threshold")
        assert(b._3 <= a._3, "doc count non-increasing in threshold")
        assert(b._4 >= a._4, "mean jaccard non-decreasing in threshold")
      case _ =>
    }
    val allPairs = NearDupGraph.lshPairs(spark, TestSpark.sfDir)
    val t1 = rows.find(_._1 == 1L).get
    assert(t1._2 === allPairs.count(),
      "t=0.1 row covers every verified pair (minJ=0.1 by construction)")
    rows.foreach { case (_, n, d, mj) =>
      assert(d >= 2 || n == 0)
      assert(mj >= 100000L && mj <= 1000000L)
    }
  }

  test("change point: exact driver-side argmax replay") {
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day").agg(sum("vm").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = Ext32Queries.changepointMean(spark, TestSpark.sfDir)
      .collect()
    val byType = daily.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val et = r.getString(0)
      val series = byType(et).sortBy(_._2)
      val n = series.length
      val s = series.map(_._3).sum
      var best = (Double.MinValue, 0L, 0L, 0L) // gain, day, i, s_l
      var sl = 0L
      series.take(n - 1).zipWithIndex.foreach { case ((_, day, x), k) =>
        sl += x
        val i = k + 1
        val gain = sl.toDouble * sl / i +
          (s - sl).toDouble * (s - sl) / (n - i) - s.toDouble * s / n
        if (gain > best._1) best = (gain, day, i.toLong, sl)
      }
      assert(r.getLong(1) === n.toLong)
      assert(r.getLong(2) === best._2, s"$et split day")
      assert(r.getLong(3) === best._4 / best._3)
      assert(r.getLong(4) === (s - best._4) / (n - best._3))
      assert(r.getLong(5) === math.round(best._1))
      assert(r.getLong(5) >= 0)
    }
  }

  test("curate3: admission accounting vs its component reports") {
    val rows = Ext32Queries.curate3(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val nDocs = t(spark, TestSpark.sfDir, "documents").count()
    assert(rows.map(_._2).sum === nDocs)
    rows.foreach { case (_, n, adm, tokAdm, fr, flang, dups, rate) =>
      assert(adm <= n)
      // admitted excludes every failure class
      assert(adm >= n - fr - flang - dups)
      assert(rate === adm * 1000000L / n)
      assert(tokAdm >= adm * 25, "admitted docs satisfy the wc>=25 rule")
      assert(tokAdm <= adm * 80, "admitted docs satisfy the wc<=80 rule")
    }
    // the dup leg must agree with dedup_survivorship's n_dropped
    val surv = Ext30Queries.survivorship(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    rows.foreach { case (src, _, _, _, _, _, dups, _) =>
      assert(dups === surv(src), s"dup count for $src")
    }
    // and the pipeline must actually gate something, everywhere-open
    // or everywhere-closed tests nothing
    val admTotal = rows.map(_._3).sum
    assert(admTotal > 0 && admTotal < nDocs)
  }
}
