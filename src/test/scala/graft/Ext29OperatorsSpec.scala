package graft

import graft.Tables.t
import graft.operators.Ext29Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the SQ8 ANN / recall-curve / backfill-plan batch,
  * including a full driver-side replay of the SQ8 quantize → int-dot
  * → candidate → re-rank chain.
  */
class Ext29OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Exact driver-side replay of the SQ8 pipeline. */
  private def replay(): (Map[Long, Seq[(Long, Long)]],
      Map[(Long, Long), Double]) = {
    val vecs = t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    val mn = vecs.values.map(_.min).min.toDouble
    val mx = vecs.values.map(_.max).max.toDouble
    val codes = vecs.map { case (id, v) =>
      id -> v.map(x => Math.round((x.toDouble - mn) / (mx - mn) * 255))
    }
    val qids = vecs.keys.filter(_ < 8).toSeq.sorted
    val cands = qids.map { q =>
      val scored = vecs.keys.filter(_ != q).toSeq.map { n =>
        val is = codes(q).zip(codes(n)).map { case (a, b) => a * b }.sum
        (n, is)
      }
      q -> scored.sortBy { case (n, is) => (-is, n) }.take(10)
    }.toMap
    val cos = for {
      (q, cs) <- cands; (n, _) <- cs
    } yield {
      val (a, b) = (vecs(q), vecs(n))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      (q, n) -> r6(dot / (math.sqrt(na) * math.sqrt(nb)))
    }
    (cands, cos.toMap)
  }

  test("sq8 ann: exact replay of candidates and re-ranked top-3") {
    val (cands, cos) = replay()
    val rows = Ext29Queries.annSq8(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.length === 8)
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq === Seq(1, 2, 3))
      val expectTop3 = cands(q)
        .map { case (n, is) => (n, is, cos((q, n))) }
        .sortBy { case (n, _, c) => (-c, n) }.take(3)
      val got = g.sortBy(_._2).map(r => (r._3, r._5, r._4)).toSeq
      assert(got === expectTop3.map(e => (e._1, e._2, e._3)).toSeq,
        s"q=$q re-rank mismatch")
    }
  }

  test("recall curve: bounds and exact driver replay") {
    val (_, _) = ((), ())
    val vecs = t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    val mn = vecs.values.map(_.min).min.toDouble
    val mx = vecs.values.map(_.max).max.toDouble
    val codes = vecs.map { case (id, v) =>
      id -> v.map(x => Math.round((x.toDouble - mn) / (mx - mn) * 255))
    }
    val qids = vecs.keys.filter(_ < 8).toSeq.sorted
    var hits = Map(1 -> 0L, 5 -> 0L, 10 -> 0L)
    qids.foreach { q =>
      val others = vecs.keys.filter(_ != q).toSeq
      val ark = others.map { n =>
        n -> codes(q).zip(codes(n)).map { case (a, b) => a * b }.sum
      }.sortBy { case (n, is) => (-is, n) }.map(_._1)
      val trk = others.map { n =>
        val (a, b) = (vecs(q), vecs(n))
        var dot = 0.0; var nb = 0.0
        a.indices.foreach { i =>
          dot += a(i).toDouble * b(i).toDouble
          nb += b(i).toDouble * b(i).toDouble
        }
        n -> r6(dot / math.sqrt(nb))
      }.sortBy { case (n, c) => (-c, n) }.map(_._1)
      Seq(1, 5, 10).foreach { k =>
        val h = ark.take(k).toSet.intersect(trk.take(k).toSet).size
        hits = hits.updated(k, hits(k) + h)
      }
    }
    val row = Ext29Queries.recallCurve(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getLong(0) === 8L)
    Seq((1, 1), (5, 2), (10, 3)).foreach { case (k, idx) =>
      val got = row.getLong(idx)
      assert(got === hits(k) * 1000000L / (8L * k), s"recall@$k")
      assert(got >= 0 && got <= 1000000L)
    }
  }

  test("backfill plan: contiguous equal chunks covering the table") {
    val rows = Ext29Queries.backfillPlan(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = t(spark, TestSpark.sfDir, "orders").count()
    assert(rows.map(_._1).toSeq === (1L to 16L))
    assert(rows.map(_._2).sum === total)
    // ntile: sizes differ by at most one, larger chunks first
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1)
    assert(sizes.sorted.reverse.toSeq === sizes.toSeq)
    // ranges are ordered and non-overlapping
    rows.sliding(2).foreach {
      case Array((_, _, _, hi1, _), (_, _, lo2, _, _)) =>
        assert(hi1 < lo2)
      case _ =>
    }
    rows.foreach { case (_, n, lo, hi, bytes) =>
      assert(lo <= hi); assert(bytes >= n * 26)
    }
  }
}
