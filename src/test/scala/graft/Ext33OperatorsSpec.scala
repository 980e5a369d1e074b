package graft

import graft.Tables.t
import graft.operators.Ext33Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the dim-energy / rich-club / shared-frames batch. */
class Ext33OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dim energy: driver replay and cumulative-share shape") {
    val vecs = t(spark, TestSpark.sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val sums = new Array[Long](dims)
    vecs.foreach { v =>
      v.indices.foreach { i =>
        val xm = Math.round(v(i).toDouble * 1000)
        sums(i) += xm * xm
      }
    }
    val rows = Ext33Queries.dimEnergy(spark, TestSpark.sfDir).collect()
    assert(rows.length === dims)
    val total = sums.sum
    var cum = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i + 1L)
      assert(r.getLong(1) === vecs.length.toLong)
      assert(r.getLong(2) === sums(i), s"dim ${i + 1} energy")
      assert(r.getLong(3) === sums(i) * 1000L / vecs.length)
      cum += sums(i)
      assert(r.getLong(4) === cum * 1000000L / total)
    }
    assert(rows.last.getLong(4) === 1000000L, "prefix reaches 100%")
    // monotone non-decreasing cumulative share
    val shares = rows.map(_.getLong(4))
    assert(shares.toSeq === shares.sorted.toSeq)
  }

  test("rich club: density bounds and threshold monotonicity of the " +
    "club size") {
    val rows = Ext33Queries.richClub(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L, 16L))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2, "club shrinks as k grows")
        assert(b._3 <= a._3, "club edges shrink as k grows")
      case _ =>
    }
    rows.foreach { case (_, n, e, phi) =>
      assert(e <= n * (n - 1) / 2 || n < 2)
      phi.foreach { p => assert(p >= 0 && p <= 1000000L) }
      if (n >= 2)
        assert(phi.contains(e * 2000000L / (n * (n - 1))))
    }
  }

  test("shared frames: every reported hash really spans >= 2 media") {
    val rows = Ext33Queries.sharedFrames(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    rows.foreach { case (_, nMedia, nFrames, _) =>
      assert(nMedia >= 2)
      assert(nFrames >= nMedia)
    }
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
    // replay one reported hash against the raw frame table
    rows.headOption.foreach { case (h, nMedia, nFrames, first) =>
      val docs = t(spark, TestSpark.sfDir, "documents")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String): String =
        md.digest(s.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
      val hits = docs.flatMap { case (id, text) =>
        val nFr = math.max(math.ceil(text.length / 64.0).toLong, 1L)
        (0L until nFr by 2L).flatMap { f =>
          val start = (f * 64).toInt
          if (start >= text.length) None
          else {
            val sub = text.substring(start,
              math.min(start + 64, text.length))
            if (md5hex(sub) == h) Some(id) else None
          }
        }
      }
      assert(hits.distinct.length.toLong === nMedia)
      assert(hits.length.toLong === nFrames)
      assert(hits.min === first)
    }
  }
}
