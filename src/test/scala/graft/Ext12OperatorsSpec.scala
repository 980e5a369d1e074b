package graft

import graft.operators.Ext12Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 5 invariants the hash-compare cannot see: the
  * weighted median satisfies its defining cumulative-weight
  * inequalities on the raw data, MAD/median are true 50th-percentile
  * values, ACF is a valid correlation (|r| <= 1) matching a driver
  * replay, Benford's expected shares decompose exactly, and MIPS
  * top-k equals an exhaustive driver-side scan.
  */
class Ext12OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("weighted median satisfies the cumulative-weight definition") {
    val out = Ext12Queries.weightedMedian(spark, TestSpark.sfDir)
      .collect().map(r =>
        r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.nonEmpty)
    val raw = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag"),
        expr("cast(round(l_extendedprice * 100) as bigint)"),
        expr("cast(round(l_quantity) as bigint)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    raw.groupBy(_._1).foreach { case (grp, rows) =>
      val (totW, med) = out(grp)
      assert(totW === rows.map(_._3).sum)
      // weight at-or-below the median reaches half the total ...
      val wLe = rows.filter(_._2 <= med).map(_._3).sum
      assert(wLe * 2 >= totW, s"grp=$grp")
      // ... and the median is the LOWEST such value
      val wLt = rows.filter(_._2 < med).map(_._3).sum
      assert(wLt * 2 < totW, s"grp=$grp")
      // the median is an actual data value (disc, not interpolated)
      assert(rows.exists(_._2 == med), s"grp=$grp")
    }
  }

  test("mad outliers: median and MAD are true 50th percentiles " +
      "and the outlier count matches a driver replay") {
    val out = Ext12Queries.madOutliers(spark, TestSpark.sfDir)
      .collect()
    assert(out.nonEmpty)
    val raw = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(round(value * 1000) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianOf(xs: Seq[Long]): Long = {
      val s = xs.sorted
      // lowest value whose doubled cumulative count reaches the total
      s((s.length - 1) / 2)
    }
    out.foreach { r =>
      val (et, n, med, mad, nOut) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val vs = raw.filter(_._1 == et).map(_._2).toSeq
      assert(n === vs.length)
      assert(med === medianOf(vs))
      assert(mad === medianOf(vs.map(v => math.abs(v - med))))
      assert(nOut === vs.count(v => math.abs(v - med) > 3 * mad))
    }
  }

  test("acf matches a driver replay and is a valid correlation") {
    val out = Ext12Queries.acf(spark, TestSpark.sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    val series = Tables.t(spark, TestSpark.sfDir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val lg = r.getLong(0)
      val pairs = series.toSeq.flatMap { case (hr, x) =>
        series.get(hr + lg).map(y => (x, y))
      }
      assert(r.getLong(1) === pairs.length)
      assert(r.getLong(2) === pairs.map(_._1).sum)
      assert(r.getLong(3) === pairs.map(_._2).sum)
      assert(r.getLong(6) === pairs.map(p => p._1 * p._2).sum)
      assert(math.abs(r.getDouble(7)) <= 1.0)
    }
  }

  test("benford: digits partition the orders and expected shares " +
      "decompose exactly") {
    val out = Ext12Queries.benford(spark, TestSpark.sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq.forall(d => d >= 1 && d <= 9))
    val nOrders =
      Tables.t(spark, TestSpark.sfDir, "orders").count()
    assert(out.map(_.getLong(1)).sum === nOrders)
    // the 9 Benford literals sum to exactly 1e6 (only for digits
    // present in the data, so sum the present subset of a full map)
    val full = Map(1 -> 301030L, 2 -> 176091L, 3 -> 124939L,
      4 -> 96910L, 5 -> 79181L, 6 -> 66947L, 7 -> 57992L,
      8 -> 51153L, 9 -> 45757L)
    assert(full.values.sum === 1000000L)
    out.foreach { r =>
      assert(r.getLong(3) === full(r.getLong(0).toInt))
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3))
      // floor-division share is within [0, 1e6]
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 1000000L)
    }
  }

  test("window rank fns: pr/cd bounds and nth_value is the 3rd " +
      "smallest per partition") {
    val rows = Ext12Queries.windowRankFns(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (prio, ps) =>
      val n = ps.length
      // total order inside the partition -> pr spans [0,1], cd (0,1]
      assert(ps.map(_._4).min === 0.0, prio)
      if (n > 1) assert(ps.map(_._4).max === 1.0, prio)
      assert(ps.map(_._5).max === 1.0, prio)
      val third =
        if (n >= 3) ps.map(_._3).sorted.apply(2) else -1L
      assert(ps.forall(_._6 == third), prio)
    }
  }

  test("char entropy matches a driver replay and the ln(26) bound") {
    val out = Ext12Queries.charEntropy(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out.nonEmpty)
    val lnCap = math.round(math.log(26.0) * 1e6)
    out.values.foreach { case (_, h) =>
      assert(h >= 0L && h <= lnCap)
    }
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val counts = text.toLowerCase.filter(c => c >= 'a' && c <= 'z')
        .groupBy(identity).map(_._2.length.toLong)
      if (counts.nonEmpty) {
        val n = counts.sum
        val sumClnc = counts.map(c =>
          c * math.round(math.log(c.toDouble) * 1e6)).sum
        val h = math.round(math.log(n.toDouble) * 1e6) - sumClnc / n
        assert(out(id) === ((n, h)), s"doc $id")
      } else assert(!out.contains(id), s"doc $id")
    }
  }

  test("calibration buckets partition the corpus and match a replay " +
      "from the langId operator output") {
    val out = graft.operators.Ext12Queries
      .evalCalibration(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    val docs = graft.operators.TextAnalysis.langId(
        Tables.t(spark, TestSpark.sfDir, "documents"), "text")
      .select(col("lang"), col("lang_guess"), col("en_hits"),
        col("es_hits"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        math.min(math.abs(r.getLong(2) - r.getLong(3)), 5L)))
    assert(out.values.map(_._1).sum === docs.length)
    docs.groupBy(_._3).foreach { case (m, rows) =>
      val (n, nc, acc) = out(m)
      assert(n === rows.length, s"margin $m")
      assert(nc === rows.count(r => r._1 == r._2), s"margin $m")
      assert(acc === nc * 1000000L / n, s"margin $m")
    }
  }

  test("stl trend: full-window interior only, replay-exact residuals") {
    val out = graft.operators.Ext12Queries
      .stlTrend(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val series = Tables.t(spark, TestSpark.sfDir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val replay = series.toSeq.flatMap { case (hr, cnt) =>
      val win = (hr - 12 to hr + 12).flatMap(series.get)
      if (win.length == 25)
        Some((hr % 24) -> (cnt * 1000 - win.sum * 1000 / 25))
      else None
    }.groupBy(_._1)
    assert(out.keySet === replay.keySet)
    replay.foreach { case (hod, rows) =>
      assert(out(hod) === ((rows.length.toLong,
        rows.map(_._2).sum)), s"hod $hod")
    }
  }

  test("ngram novelty: every shingle's novelty is charged to exactly " +
      "its first owner (per-corpus shingle count conservation)") {
    val out = graft.operators.Ext12Queries
      .ngramNovelty(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val sh = graft.operators.Dedup.shingles(
        Tables.t(spark, TestSpark.sfDir, "documents"), "doc_id",
        "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // conservation: total novel shingles == distinct shingles in the
    // corpus (each charged exactly once), totals match per doc
    assert(out.map(_._3).sum === sh.map(_._2).distinct.length)
    val perDoc = sh.groupBy(_._1)
    out.foreach { case (id, n, novel) =>
      assert(n === perDoc(id).length, s"doc $id")
      val firsts = sh.groupBy(_._2).map { case (s, rows) =>
        s -> rows.map(_._1).min
      }
      assert(novel === perDoc(id).count { case (_, s) =>
        firsts(s) == id }, s"doc $id")
    }
  }

  test("survival curve: k=0 is everyone, monotone non-increasing, " +
      "replay-exact") {
    val out = graft.operators.Ext12Queries
      .survivalCurve(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq === (0L to 14L))
    assert(out.head._3 === out.head._2) // k=0: everyone survives
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"k=${b._1}")
    }
    val lives = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy("user_id").agg((max("day") - min("day")).as("life"))
      .collect().map(_.getLong(1))
    out.foreach { case (k, n, surv, micro) =>
      assert(n === lives.length)
      assert(surv === lives.count(_ >= k), s"k=$k")
      assert(micro === surv * 1000000L / n, s"k=$k")
    }
  }

  test("pmi collocations: counts floor respected, pmi arithmetic " +
      "self-consistent, descending order") {
    val out = graft.operators.Ext12Queries
      .pmiCollocations(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty && out.length <= 25)
    // recompute N (total bigrams) independently
    val n = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(expr(
        "greatest(size(split(trim(lower(text)), '\\\\s+')) - 1, 0)")
        .as("nb"))
      .agg(sum("nb")).head().getLong(0)
    out.foreach { case (a, b, cab, ca, cb, pmi) =>
      assert(cab >= 5, s"($a,$b)")
      val want = math.round(math.log(
        cab.toDouble * n / (ca.toDouble * cb.toDouble)) * 1e6)
      assert(pmi === want, s"($a,$b)")
    }
    assert(out.map(_._6).toSeq === out.map(_._6).sortBy(-_).toSeq)
  }

  test("range search equals an exhaustive driver scan for q_id=3 " +
      "and agrees with mips/cosine machinery") {
    val got = graft.operators.Ext12Queries
      .rangeSearch(spark, TestSpark.sfDir)
      .filter(col("q_id") === 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val vecs = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = vecs.toMap.apply(3L)
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var acc = 0.0; var j = 0
      while (j < x.length) { acc += x(j).toDouble * y(j).toDouble; j += 1 }
      acc
    }
    val qn = math.sqrt(dot(q, q))
    val want = vecs.filter(_._1 != 3L).flatMap { case (id, v) =>
      val s = BigDecimal(dot(q, v) / (qn * math.sqrt(dot(v, v))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (s >= 0.3) Some(id -> s) else None
    }.toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (id, s) =>
      assert(math.abs(got(id) - s) < 1e-9, s"n_id $id")
    }
  }

  test("row anomaly matches a driver replay over the day series") {
    val out = graft.operators.Ext12Queries
      .rowAnomaly(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val days = Tables.t(spark, TestSpark.sfDir, "events")
      .select(expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val expectRows = days.indices.drop(7).map { i =>
      val win = days.slice(i - 7, i).map(_._2)
      val (sum, sumsq) = (win.sum, win.map(c => c * c).sum)
      (days(i)._1, days(i)._2, sum, sumsq)
    }
    assert(out.length === expectRows.length)
    out.zip(expectRows).foreach { case (r, (day, cnt, sum, sumsq)) =>
      assert(r.getLong(0) === day)
      assert(r.getLong(1) === cnt)
      assert(r.getLong(2) === sum)
      assert(r.getLong(3) === sumsq)
      if (!r.isNullAt(4)) {
        val z = (cnt * 7 - sum).toDouble /
          math.sqrt((sumsq * 7 - sum * sum).toDouble)
        assert(math.abs(r.getDouble(4) -
          BigDecimal(z).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      }
    }
  }

  test("active users 7d equals a driver replay of the sliding " +
      "distinct") {
    val out = graft.operators.Ext12Queries
      .activeUsers7d(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    val ud = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mxd = ud.map(_._2).max
    val want = ud.flatMap { case (u, d) =>
      (d to math.min(d + 6, mxd)).map(w => w -> u)
    }.groupBy(_._1).map { case (w, us) =>
      w -> us.map(_._2).distinct.length.toLong
    }
    assert(out === want)
    // a trailing window never counts more than the full-corpus DAU sum
    out.foreach { case (w, n) => assert(n > 0, s"w_day $w") }
  }

  test("percentile_cont: p50 <= p90 and groups partition the corpus") {
    val out = graft.operators.Ext12Queries
      .percentileCont(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val nEvents = Tables.t(spark, TestSpark.sfDir, "events").count()
    assert(out.map(_.getLong(1)).sum === nEvents)
    out.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), r.getString(0))
    }
  }

  test("mips top-k equals an exhaustive driver-side scan for q_id=3") {
    val out = Ext12Queries.mipsTopK(spark, TestSpark.sfDir)
      .filter(col("q_id") === 3).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.length === 10)
    val vecs = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = vecs.toMap.apply(3L)
    val best = vecs.filter(_._1 != 3L).map { case (id, v) =>
      // same fold order as the codegen'd vecDot: sequential over j,
      // float product widened to double accumulation
      var acc = 0.0
      var j = 0
      while (j < q.length) { acc += q(j).toDouble * v(j).toDouble; j += 1 }
      (id, BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }.sortBy { case (id, ip) => (-ip, id) }.take(10)
    out.zip(best).zipWithIndex.foreach { case (((oid, oip, ork),
        (bid, bip)), i) =>
      assert(ork === i + 1)
      assert(oid === bid, s"rank ${i + 1}")
      assert(math.abs(oip - bip) < 1e-9, s"rank ${i + 1}")
    }
  }
}
