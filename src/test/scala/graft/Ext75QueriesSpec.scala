package graft

import graft.operators.{Ext75Queries, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext75QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5FirstHexEven(s: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) >> 4) & 1) == 0
  }

  test("AMS F2: estimators, lower median and exact F2 replay " +
      "driver-side") {
    val row = Ext75Queries.amsF2(spark, TestSpark.sfDir).head()
    val counts = Tables.t(spark, TestSpark.sfDir, "events")
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val f2 = counts.map { case (_, c) => c * c }.sum
    val xs = (0 until 16).map { i =>
      val s = counts.map { case (u, c) =>
        if (md5FirstHexEven(s"ams:$i:$u")) c else -c
      }.sum
      (s * s, i)
    }.sortBy(identity)
    val median = xs(7)._1 // 8th of 16 under (x, i)
    assert(row.getLong(0) === 16L)
    assert(row.getLong(1) === median)
    assert(row.getLong(2) === xs.head._1)
    assert(row.getLong(3) === xs.last._1)
    assert(row.getLong(4) === f2)
    assert(row.getLong(5) ===
      math.abs(median - f2) * 1000000L / f2)
    // the tug-of-war median is a real estimate, not garbage: within
    // 3/sqrt(k)·F2 of truth w.h.p. — generous 2x slack for a fixture
    assert(math.abs(median - f2).toDouble <= 1.5 * f2.toDouble,
      s"AMS median $median vs exact $f2 is out of the error regime")
  }

  test("zone maps: clustered layout dominates natural on every " +
      "predicate; one predicate replays exactly") {
    val rows = Ext75Queries.zonemapPrune(spark, TestSpark.sfDir)
      .collect()
    assert(rows.length === 12) // 2 layouts x 6 predicates
    val byQ = rows.groupBy(_.getLong(1))
    byQ.values.foreach { rs =>
      val nat = rs.find(_.getString(0) == "natural").get
      val clu = rs.find(_.getString(0) == "clustered").get
      // same predicate, same exact answer
      assert(nat.getLong(7) === clu.getLong(7))
      // sort-on-write can only improve min/max pruning for a
      // predicate on the sort key
      assert(clu.getLong(5) <= nat.getLong(5), "files_read")
      assert(clu.getLong(6) <= nat.getLong(6), "rows_scanned")
      // a scan never reads fewer rows than it returns
      assert(clu.getLong(6) >= clu.getLong(7))
      assert(nat.getLong(6) >= nat.getLong(7))
    }
    // exact replay of predicate q=2, natural layout
    val li = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .selectExpr("l_orderkey",
        "unix_micros(cast(l_shipdate as timestamp))" +
          " div 86400000000 as day")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxOk = li.map(_._1).max
    val (minD, maxD) = (li.map(_._2).min, li.map(_._2).max)
    val span = maxD - minD
    val (lo, hi) = (minD + 2 * (span / 8), minD + 2 * (span / 8) + span / 12)
    val files = li.groupBy { case (ok, _) => ok / (maxOk / 64 + 1) }
    val read = files.values.filter { f =>
      f.map(_._2).max >= lo && f.map(_._2).min <= hi }
    val nat2 = rows.find(r =>
      r.getString(0) == "natural" && r.getLong(1) == 2L).get
    assert(nat2.getLong(2) === lo)
    assert(nat2.getLong(3) === hi)
    assert(nat2.getLong(4) === files.size.toLong)
    assert(nat2.getLong(5) === read.size.toLong)
    assert(nat2.getLong(6) === read.map(_.size).sum.toLong)
    assert(nat2.getLong(7) ===
      li.count { case (_, d) => d >= lo && d <= hi }.toLong)
  }

  test("multi-probe LSH: candidate sets replay from driver-side " +
      "buckets; probing strictly widens at least one query") {
    val rows = Ext75Queries.simAnnMultiprobe(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def bucket(v: Array[Float]): String =
      (0 until 8).map { p =>
        var acc = 0.0
        var j = 0
        while (j < v.length) {
          acc += v(j).toDouble * Similarity.planeComponent(p, j)
          j += 1
        }
        if (acc >= 0) '1' else '0'
      }.mkString
    val buckets = emb.map { case (id, v) => id -> bucket(v) }.toMap
    val qs = emb.filter(_._1 < 8).map(_._1)
    val gotByQ = rows.groupBy(_.getLong(0))
    qs.foreach { q =>
      val qb = buckets(q)
      val probes = (qb +: (0 until 8).map(i =>
        qb.updated(i, if (qb(i) == '1') '0' else '1')).toSeq).toSet
      val cands = emb.map(_._1)
        .filter(n => n != q && probes(buckets(n)))
      val exactOnly = emb.map(_._1)
        .filter(n => n != q && buckets(n) == qb)
      gotByQ.get(q).foreach { rs =>
        assert(rs.head.getLong(3) === cands.size.toLong,
          s"n_cand for query $q")
        assert(cands.size >= exactOnly.size)
      }
    }
    // somewhere in the fixture, probing must genuinely add candidates
    val widened = qs.exists { q =>
      val qb = buckets(q)
      val probes = (0 until 8).map(i =>
        qb.updated(i, if (qb(i) == '1') '0' else '1')).toSet
      emb.map(_._1).exists(n => n != q && probes(buckets(n)))
    }
    assert(widened, "fixture never exercises the probe expansion")
    // ranks are 1..n_returned per query, sims descending
    gotByQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq ===
        (1L to sorted.length.toLong))
      val sims = sorted.map(_.getDouble(2)).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("BLEU: first pair replays driver-side; scores are in [0,1] " +
      "and clipped numerators are bounded") {
    val rows = Ext75Queries.evalBleu(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "p1_num <= cand_toks")
      assert(r.getLong(5) <= r.getLong(6), "p2_num <= p2_den")
      val b = r.getDouble(7)
      assert(b >= 0.0 && b <= 1.0, s"bleu $b out of range")
    }
    val texts = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def toks(id: Long): Seq[String] =
      texts(id).trim.split("\\s+").toSeq.map(_.toLowerCase)
    def grams(ts: Seq[String], n: Int): Map[String, Long] =
      ts.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
    val r0 = rows.head
    val (ref, cand) = (toks(r0.getLong(0)), toks(r0.getLong(1)))
    assert(r0.getLong(2) === ref.size.toLong)
    assert(r0.getLong(3) === cand.size.toLong)
    val (u1, u2) = (grams(ref, 1), grams(cand, 1))
    val p1 = u2.map { case (g, c) => math.min(c, u1.getOrElse(g, 0L)) }
      .sum
    assert(r0.getLong(4) === p1)
    val (b1, b2) = (grams(ref, 2), grams(cand, 2))
    val p2 = b2.map { case (g, c) => math.min(c, b1.getOrElse(g, 0L)) }
      .sum
    assert(r0.getLong(5) === p2)
    assert(r0.getLong(6) === b2.values.sum)
    if (p1 > 0 && p2 > 0) {
      val bp = math.min(1.0,
        math.exp(1.0 - ref.size.toDouble / cand.size))
      val want = bp * math.exp(0.5 *
        (math.log(p1.toDouble / cand.size) +
          math.log(p2.toDouble / b2.values.sum)))
      val wantR6 = java.math.BigDecimal.valueOf(want)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r0.getDouble(7) === wantR6)
    }
  }
}
