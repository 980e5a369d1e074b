package graft

import graft.Tables.t
import graft.operators.{Ext30Queries, Ext3Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the cross-modal / survivorship / replay batch. */
class Ext30OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("clip align: full driver-side replay per source") {
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val embs = t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).take(8).toArray)
      .toMap
    val perDoc = docs.flatMap { case (id, src, text) =>
      embs.get(id).map { e8 =>
        val h = new Array[Long](8)
        text.foreach(ch => h(ch.toInt % 8) += 1)
        var dot = 0.0; var nh = 0.0; var ne = 0.0
        (0 until 8).foreach { i =>
          dot += h(i).toDouble * e8(i).toDouble
          nh += h(i).toDouble * h(i).toDouble
          ne += e8(i).toDouble * e8(i).toDouble
        }
        val cos = dot / (math.sqrt(nh) * math.sqrt(ne))
        (src, math.round(cos * 1e6))
      }
    }
    val expect = perDoc.groupBy(_._1).map { case (src, g) =>
      val s = g.map(_._2).sum
      val n = g.length.toLong
      src -> (n, Math.floorDiv(s, n), g.map(_._2).min,
        g.count(_._2 < 0).toLong)
    }
    val rows = Ext30Queries.clipAlign(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val got = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(expect(r.getString(0)) === got,
        s"source ${r.getString(0)}")
    }
    // the audit must have spread — identical scores for every doc
    // would mean the featurizer is inert
    assert(perDoc.map(_._2).distinct.length > 10)
  }

  test("survivorship: conservation and cross-consistency with " +
    "keep-best") {
    val rows = Ext30Queries.survivorship(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val nDocs = t(spark, TestSpark.sfDir, "documents").count()
    assert(rows.map(_._2).sum === nDocs)
    rows.foreach { case (_, n, clustered, dropped, survivors, _, mic) =>
      assert(survivors === n - dropped)
      assert(dropped <= clustered)
      assert(mic === survivors * 1000000L / n)
    }
    // globally: dropped = cluster members − clusters (keep-best keeps
    // exactly one per cluster)
    val kb = Ext3Queries.keepBest(spark, TestSpark.sfDir).collect()
    val expectDropped = kb.map(_.getLong(3)).sum - kb.length
    assert(rows.map(_._4).sum === expectDropped)
    val labels = NearDupGraph.ccLabels(spark, TestSpark.sfDir)
    assert(rows.map(_._3).sum === labels.count())
  }

  test("bandit replay: full driver-side replay") {
    val cut = 1705363200L
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val fit = ev.filter(_._2 < cut).groupBy(_._1).map { case (a, g) =>
      a -> (g.length.toLong, g.map(_._3).sum)
    }
    val target = fit.toSeq
      .sortBy { case (a, (n, s)) => (-(s / n), a) }.head._1
    val post = ev.filter(_._2 >= cut)
    val matched = post.filter(_._1 == target)
    val row = Ext30Queries.banditReplay(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getString(0) === target)
    assert(row.getLong(1) === fit(target)._2 / fit(target)._1)
    assert(row.getLong(2) === matched.length.toLong)
    assert(row.getLong(3) === matched.map(_._3).sum / matched.length)
    assert(row.getLong(4) === post.length.toLong)
    assert(row.getLong(5) === post.map(_._3).sum / post.length)
    assert(row.getLong(6) === row.getLong(3) - row.getLong(5))
  }
}
