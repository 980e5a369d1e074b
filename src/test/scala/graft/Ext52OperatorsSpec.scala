package graft

import graft.Tables.t
import graft.operators.{Ext21Queries, Ext52Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the try-arithmetic / checksum / A/V-sync batch. */
class Ext52OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("try arithmetic: NULL lanes match the explicit guards, and " +
    "no TRY expression ever throws") {
    val rows = Ext52Queries.tryArithmetic(spark, TestSpark.sfDir)
      .collect()
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    rows.foreach { r =>
      val g = ev(r.getString(0))
      assert(r.getLong(1) === g.length)
      val parsed = g.filter(_._1 % 3 == 0).map(_._3)
      assert(r.getLong(2) === parsed.length, "try_cast parse count")
      assert(r.getLong(3) === parsed.sum, "try_cast parse sum")
      assert(r.getLong(4) === g.count(e => e._3 > e._3 % 2),
        "try_add overflow count")
      assert(r.getLong(5) === g.count(_._3 % 5 != 0),
        "try_divide survivor count")
    }
  }

  test("checksum: total row is the fold of the shard rows, and one " +
    "flipped value changes exactly one shard's fingerprint") {
    val rows = Ext52Queries.tableChecksum(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (tot, shards) = rows.partition(_._1 == -1L)
    assert(tot.length === 1 && shards.nonEmpty)
    assert(tot.head._2 === shards.map(_._2).sum)
    assert(tot.head._3 === shards.map(_._3).reduce(_ ^ _))
    assert(tot.head._4 === shards.map(_._4).sum)
    // sensitivity: recompute with one row's vm perturbed — only that
    // row's shard fingerprint may change, and it must change
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def fp(rows: Seq[(Long, Long, String, Long)]): Map[Long, Long] =
      rows.groupBy(_._2 % 16).view.mapValues(_.map { e =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${e._1}|${e._2}|${e._3}|${e._4}".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        java.lang.Long.parseLong(h.substring(0, 15), 16)
      }.reduce(_ ^ _)).toMap
    val base = fp(ev.toSeq)
    assert(base === shards.map(s => s._1 -> s._3).toMap,
      "scala replay of the xor fingerprint")
    val perturbed = fp(ev.toSeq.updated(0,
      ev(0).copy(_4 = ev(0)._4 + 1)))
    val changed = base.keySet.filter(k => base(k) != perturbed(k))
    assert(changed === Set(ev(0)._2 % 16),
      "exactly the touched shard must change")
  }

  test("av sync: planted transport drift recovered wherever the " +
    "shared anchors dominate") {
    val got = Ext52Queries.avSync(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val kf = Ext21Queries.keyframes(spark, TestSpark.sfDir)
      .select("media_id", "seg_no", "key_frame").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    // replay the estimator per media
    got.foreach { case (m, lag, n) =>
      val frames = kf(m).map(_._3).toSet
      val drift = m % 7 - 3
      val audio = kf(m).map(_._3 + drift) ++
        kf(m).filter(_._2 % 3 == 1).map(_._3 * 2 + 5)
      val scores = (-3L to 3L).map(l =>
        (l, audio.count(a => frames(a + l)).toLong))
        .filter(_._2 > 0)
      val best = scores.minBy { case (l, s) => (-s, l) }
      assert((lag, n) === best, s"media $m estimator replay")
    }
    // recovery: the signal anchors cover every keyframe, so the true
    // lag wins except where a noise anchor coincidentally ties it —
    // demand ≥ 90% of media report the planted drift
    val recovered = got.count { case (m, lag, _) => lag == -(m % 7 - 3) }
    assert(recovered * 10 >= got.length * 9,
      s"only $recovered/${got.length} media recovered the drift")
  }
}
