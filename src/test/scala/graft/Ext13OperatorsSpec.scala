package graft

import graft.operators.Ext13Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch 1 invariants the hash-compare cannot see: the CUSUM
  * statistic matches an exact driver replay and telescopes to zero at
  * the series end, the Holt recursion matches a `Math.floorDiv` replay
  * row-for-row (including negative-trend flooring), and the
  * skew/kurtosis moments match BigInt-exact power sums with the
  * closed-form double within tolerance of a direct two-pass
  * computation.
  */
class Ext13OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def daily(): Seq[(Int, Long)] =
    Tables.t(spark, TestSpark.sfDir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')"),
        expr("cast(round(value * 1000) as bigint)"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)

  test("cusum matches an exact driver replay and ends at zero") {
    val out = Ext13Queries.cusum(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val series = daily()
    assert(out.length === series.length)
    val n = series.length.toLong
    val total = series.map(_._2).sum
    var cum = 0L
    val expected = series.zipWithIndex.map { case ((d, v), i) =>
      cum += v
      (d, v, n * cum - (i + 1) * total)
    }
    assert(out.map(t => (t._1, t._2, t._3)).toSeq === expected)
    // telescoping: at k = n the scaled deviation is identically zero
    assert(out.last._3 === 0L)
    // exactly the max-|S| rows are flagged, and at least one is
    val maxAbs = expected.map(t => math.abs(t._3)).max
    out.foreach { t =>
      assert((t._4 == 1) === (math.abs(t._3) == maxAbs))
    }
    assert(out.exists(_._4 == 1))
  }

  test("holt recursion matches a floorDiv driver replay") {
    val out = Ext13Queries.holt(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val series = daily()
    assert(out.length === series.length)
    var l = series.head._2
    var b = 0L
    val expected = series.head match {
      case (d0, v0) =>
        (d0, v0, l, b) +: series.tail.map { case (d, v) =>
          val nl = Math.floorDiv(v + l + b, 2)
          val nb = Math.floorDiv(nl - l + b, 2)
          l = nl; b = nb
          (d, v, l, b)
        }
    }
    assert(out.toSeq === expected)
    // the recursion genuinely smooths: levels track the series scale
    assert(out.map(_._3).max <= series.map(_._2).max)
    // negative trends occur in this series (the floor-division of
    // negative numerators is exercised, not vacuous)
    assert(out.exists(_._4 < 0L))
  }

  test("skew/kurtosis moments are BigInt-exact and the closed form " +
      "agrees with a direct two-pass computation") {
    val out = Ext13Queries.skewKurtosis(spark, TestSpark.sfDir)
      .collect()
    assert(out.nonEmpty)
    val raw = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"), expr("cast(round(value) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    out.foreach { r =>
      val et = r.getString(0)
      val xs = raw.filter(_._1 == et).map(_._2)
      val n = xs.length.toLong
      assert(r.getLong(1) === n)
      // power sums exact vs BigInt accumulation
      assert(BigInt(r.getLong(2)) === xs.map(BigInt(_)).sum)
      assert(BigInt(r.getLong(3)) === xs.map(x => BigInt(x) * x).sum)
      assert(BigInt(r.getLong(4)) ===
        xs.map(x => BigInt(x) * x * x).sum)
      assert(BigInt(r.getLong(5)) ===
        xs.map(x => BigInt(x) * x * x * x).sum)
      // two-pass central moments as the independent reference
      val mean = xs.map(_.toDouble).sum / n
      val m2 = xs.map(x => math.pow(x - mean, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
      val skew = m3 / math.pow(m2, 1.5)
      val kurt = m4 / (m2 * m2) - 3.0
      assert(math.abs(r.getDouble(6) - skew) < 1e-4,
        s"$et skew ${r.getDouble(6)} vs $skew")
      assert(math.abs(r.getDouble(7) - kurt) < 1e-4,
        s"$et kurt ${r.getDouble(7)} vs $kurt")
    }
  }

  test("top paths match a driver sessionize-and-count replay") {
    val out = Ext13Queries.topPaths(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.nonEmpty && out.length <= 25)
    val raw = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val gap = 1800L * 1000000000L
    val paths = raw.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      // split into sessions at > 30 min gaps, emit trigrams per session
      val sessions = sorted.foldLeft(List.empty[List[(Long, String)]]) {
        case (acc, e) =>
          acc match {
            case (cur @ ((lastTs, _) :: _)) :: rest
                if e._3 - lastTs <= gap =>
              ((e._3, e._4) :: cur) :: rest
            case _ => List((e._3, e._4)) :: acc
          }
      }.map(_.reverse.map(_._2))
      sessions.flatMap(s => s.sliding(3).filter(_.length == 3)
        .map(_.mkString(">")))
    }
    val counts = paths.groupBy(identity).view.mapValues(_.size.toLong)
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(25).zipWithIndex
      .map { case ((p, n), i) => (p, n, i + 1) }
    assert(out.toSeq === expected)
  }

  test("k-core peel reaches its fixpoint within the declared rounds " +
      "and every survivor has degree >= k") {
    val out = Ext13Queries.kcore(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    // every surviving node meets the core threshold
    assert(out.forall(_._2 >= 3L))
    // driver replay: peel to the TRUE fixpoint and compare — proves
    // the declared 4 rounds are enough at this SF (a 5th round is a
    // no-op), not just that 4 rounds ran
    val oneWay = Tables.t(spark, TestSpark.sfDir, "orders")
      .join(Tables.t(spark, TestSpark.sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey") + 1000000L)
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (oneWay ++ oneWay.map(e => (e._2, e._1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != edges.size
      edges = next
    }
    val expected = edges.groupBy(_._1).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    assert(out.toSeq === expected)
  }

  test("ivm top-k: buffer underflow takes the refetch branch and " +
      "both branches match a full recompute") {
    import spark.implicits._
    // base id 35u+1 (%5=1, never %7=0); delta update 35u+9 (%5=4,
    // %7!=0); delta DELETE 35u+14 (%5=4, %7=0) — the arithmetic the
    // query's selectors key on
    def base(u: Long, g: String, vm: Long) = (35 * u + 1, u, g, vm, false)
    def upd(u: Long, g: String, vm: Long) = (35 * u + 9, u, g, vm, false)
    def del(u: Long, g: String) = (35 * u + 14, u, g, 0L, true)
    // group A: 6 users, deltas DELETE its top-2 candidates -> with
    // k=2, buf=1 only 1 candidate survives (< k) and g_n=6 > k+buf:
    // unsafe, must refetch below the old candidate boundary
    // group B: 4 users, one mid update: 2 candidates survive: safe
    // group C: new group arriving only in the delta
    val rows =
      (1L to 6L).map(u => base(u, "A", 700 - 100 * u)) ++
        Seq(del(1L, "A"), del(2L, "A")) ++
        (11L to 14L).map(u => base(u, "B", 2000 - 100 * u)) ++
        Seq(upd(13L, "B", 2500L)) ++
        Seq(upd(21L, "C", 50L))
    val ev = rows.toDF("event_id", "user_id", "event_type", "vm", "del")
    val out = operators.Ext13Queries.ivmTopKCore(ev, k = 2, buf = 1)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    // full recompute: per-user LWW, live only, top-2 per group
    val lww = rows.groupBy(_._2).map { case (_, rs) =>
      rs.maxBy(_._1)
    }.filter(!_._5).toSeq
    val expected = lww.groupBy(_._3).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._4, r._2)).take(2).zipWithIndex
        .map { case (r, i) => (g, r._2, r._4, i + 1) }
    }.sortBy(t => (t._1, t._4))
    assert(out.toSeq === expected)
    // the A rows prove the refetch: user 3 (old candidate) and user 4
    // (BELOW the old k+buf boundary) — unreachable via the safe merge
    assert(out.filter(_._1 == "A").map(_._2).toSeq === Seq(3L, 4L))
    // B took the safe path shape: updated user 13 leads, survivor 11
    assert(out.filter(_._1 == "B").map(_._2).toSeq === Seq(13L, 11L))
    // new group C appears with its single delta row
    assert(out.filter(_._1 == "C").map(_._2).toSeq === Seq(21L))
  }

  test("ivm top-k on the fixture corpus equals a full recompute") {
    val out = operators.Ext13Queries.ivmTopK(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(out.nonEmpty)
    val raw = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val expected = raw.groupBy(_._2).map { case (_, rs) =>
      rs.maxBy(_._1)
    }.filter(r => r._1 % 7 != 0).toSeq
      .groupBy(_._3).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._4, r._2)).take(3).zipWithIndex
          .map { case (r, i) => (g, r._2, r._4, i + 1) }
      }.sortBy(t => (t._1, t._4))
    assert(out.toSeq === expected)
  }

  test("cluster radius report conserves members and orders moments") {
    val out = operators.Ext13Queries
      .clusterRadius(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val nVecs = Tables.t(spark, TestSpark.sfDir, "embeddings").count()
    assert(out.map(_._2).sum === nVecs)
    // ≤ nCells clusters; labels are fit-internal (seed-derived), and
    // the embed_kmeans cross-check below pins them exactly
    assert(out.length <= 16)
    out.foreach { case (cell, n, minS, sumS, meanS) =>
      // floor-mean sits between min and the max possible sim
      assert(meanS >= minS, s"cell $cell")
      assert(meanS <= 1000000L, s"cell $cell")
      // floored mean reconstructs the sum within n
      assert(meanS * n <= sumS && sumS < (meanS + 1) * n, s"cell $cell")
    }
    // the assignment agrees with embed_kmeans' cluster sizes (same fit)
    val sizes = operators.ExtQueries.embedKmeans(spark, TestSpark.sfDir)
      .select(col("cell"), col("cluster_size")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    out.foreach { case (cell, n, _, _, _) =>
      assert(sizes(cell) === n, s"cell $cell")
    }
  }

  test("nearest as-of picks the min |dt| purchase with ties to the " +
      "past") {
    val out = operators.Ext13Queries
      .asofNearest(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val raw = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val purByUser = raw.filter(_._4 == "purchase")
      .groupBy(_._2).view.mapValues { ps =>
        ps.groupBy(_._3).map { case (t, rs) =>
          (t, rs.map(_._1).min)
        }.toSeq
      }.toMap
    assert(out.length === raw.length)
    val outMap = out.map(t => t._1 -> (t._3, t._4)).toMap
    raw.foreach { case (eid, uid, tus, _) =>
      val (gotSeq, gotDt) = outMap(eid)
      purByUser.get(uid) match {
        case None => assert(gotSeq.isEmpty && gotDt.isEmpty, s"e$eid")
        case Some(ps) =>
          // min |dt|, ties to the past (dt <= 0 preferred)
          val best = ps.map { case (t, seq) => (t - tus, seq) }
            .minBy { case (dt, _) => (math.abs(dt), dt) }
          assert(gotDt.contains(best._1), s"e$eid")
          assert(gotSeq.contains(best._2), s"e$eid")
      }
    }
  }

  test("bfs layers equal true bfs distances capped at depth 3") {
    val out = operators.Ext13Queries
      .bfsLayers(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val edges0 = Tables.t(spark, TestSpark.sfDir, "orders")
      .join(Tables.t(spark, TestSpark.sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey") + 1000000L)
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (edges0 ++ edges0.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = edges0.map(_._2).distinct
      .filter(s => (s - 1000000L) % 10 == 0).toSet
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (d <- 1 to 3) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
        .filterNot(dist.contains)
      dist = dist ++ frontier.map(_ -> d)
    }
    assert(out.toMap === dist)
    // all four layers are non-trivial at this SF
    assert((0 to 3).forall(d => out.exists(_._2 == d)))
  }

  test("cdc op mix conserves messages and shares") {
    val out = operators.CdcQueries.opMix(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nEvents = Tables.t(spark, TestSpark.sfDir, "events").count()
    assert(out.map(_._2).sum === nEvents)
    val shares = out.map(_._4)
    assert(shares.sum <= 1000000L &&
      shares.sum > 1000000L - out.length)
    // the synthetic envelope generator routes every op kind
    assert(out.map(_._1).toSet === Set("drop", "erase", "update",
      "update_keys_only", "update_newimage"))
    out.foreach { case (op, n, k, _) =>
      assert(k <= n, op)
    }
  }

  test("session stats conserve events and sessions") {
    val out = operators.Ext13Queries
      .sessionStats(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val raw = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // event conservation: every event is in exactly one session
    assert(out.map { case (ne, ns, _) => ne * ns }.sum ===
      raw.length.toLong)
    // session count matches a driver sessionization replay
    val gap = 1800L * 1000000000L
    val nSess = raw.groupBy(_._1).values.map { evs =>
      val ts = evs.map(e => (e._3, e._2)).sorted.map(_._1)
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > gap }
    }.sum
    assert(out.map(_._2).sum === nSess.toLong)
  }

  test("rollup shares telescope within truncation bounds") {
    val out = operators.Ext13Queries
      .rollupShare(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // leaf revenue matches a direct aggregate
    val direct = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    out.foreach { case (f, s, cents, _, _) =>
      assert(direct((f, s)) === cents)
    }
    // per flag: floored leaf shares sum to 1e6 minus < nLeaves
    out.groupBy(_._1).foreach { case (f, rows) =>
      val tot = rows.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - rows.length, s"$f")
      // flag-share column is constant within the flag
      assert(rows.map(_._5).distinct.length === 1, s"$f")
    }
    // flag shares of total telescope the same way
    val flagShares = out.groupBy(_._1).view.mapValues(_.head._5)
      .values.toSeq
    val ftot = flagShares.sum
    assert(ftot <= 1000000L && ftot > 1000000L - flagShares.length)
  }

  test("vocab growth matches an exact replay and is heaps-shaped") {
    val row = operators.Ext13Queries
      .vocabGrowth(spark, TestSpark.sfDir).collect().head
    val (n, beta, icept) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2))
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set[String]()
    var cumN = 0L
    val pts = docs.map { case (_, text) =>
      val toks = text.trim.split("\\s+").map(_.toLowerCase)
      cumN += toks.length
      toks.foreach(seen += _)
      (math.round(math.log(cumN.toDouble) * 1e6),
        math.round(math.log(seen.size.toDouble) * 1e6))
    }
    assert(n === pts.length.toLong)
    val nn = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val repBeta = (nn.toDouble * sxy - sx.toDouble * sy) /
      (nn.toDouble * sxx - sx.toDouble * sx)
    assert(math.abs(beta - repBeta) < 1e-5)
    val repIcept = (sy.toDouble - repBeta * sx) / nn.toDouble
    assert(math.abs(icept - repIcept) < 1e-5)
    // vocabulary grows sublinearly in corpus size
    assert(beta > 0.0 && beta <= 1.0, s"beta $beta")
  }

  test("assortativity is a valid correlation matching exact moments") {
    val row = operators.Ext13Queries
      .assortativity(spark, TestSpark.sfDir).collect().head
    val r = row.getDouble(6)
    assert(r >= -1.0 && r <= 1.0)
    val edges = Tables.t(spark, TestSpark.sfDir, "orders")
      .join(Tables.t(spark, TestSpark.sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val dc = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ds = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(row.getLong(0) === edges.length.toLong)
    assert(row.getLong(1) === edges.map(e => dc(e._1)).sum)
    assert(row.getLong(2) === edges.map(e => ds(e._2)).sum)
    assert(row.getLong(5) ===
      edges.map(e => dc(e._1) * ds(e._2)).sum)
  }

  test("auc equals the brute-force pair-counting definition") {
    val row = operators.Ext13Queries.evalAuc(spark, TestSpark.sfDir)
      .collect().head
    val (nPos, nNeg, rPos2, aucMicro) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3))
    val data = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select(
        expr("cast(round(cast(element_at(embedding, 1) as double)" +
          " * 1000000) as bigint)"),
        (col("label") % 2 === 0))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val pos = data.filter(_._2).map(_._1)
    val neg = data.filterNot(_._2).map(_._1)
    assert(nPos === pos.length.toLong && nNeg === neg.length.toLong)
    // independent definition: P(score_pos > score_neg) + ties/2
    var gt = 0L; var tie = 0L
    for (p <- pos; n <- neg) {
      if (p > n) gt += 1 else if (p == n) tie += 1
    }
    assert(rPos2 - nPos * (nPos + 1) === 2 * gt + tie)
    assert(aucMicro === ((2 * gt + tie) * 1000000L) /
      (2 * nPos * nNeg))
    assert(aucMicro >= 0L && aucMicro <= 1000000L)
  }

  test("seasonality strength is a valid variance share and matches " +
      "an integer replay") {
    val row = operators.Ext13Queries
      .seasonalityStrength(spark, TestSpark.sfDir).collect().head
    val (n, s, q, ssb, strength) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    // replay the detrended series from raw hourly counts
    val hours = Tables.t(spark, TestSpark.sfDir, "events")
      .select(expr("(ts div 1000) div 3600000000"))
      .collect().map(_.getLong(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy(_._1)
    val hmap = hours.toMap
    val det = hours.flatMap { case (hr, cnt) =>
      val win = (hr - 12 to hr + 12).flatMap(hmap.get)
      if (win.length == 25)
        Some((hr % 24, cnt * 1000 - win.sum * 1000 / 25))
      else None
    }
    assert(n === det.length.toLong)
    assert(s === det.map(_._2).sum)
    assert(q === det.map(d => d._2 * d._2).sum)
    val ssbRep = det.groupBy(_._1).values.map { g =>
      val sg = g.map(_._2).sum
      sg * sg / g.length
    }.sum
    assert(ssb === ssbRep)
    assert(strength >= 0.0 && strength <= 1.0)
  }

  test("degree histogram conserves the edge count on both sides") {
    val hist = operators.Ext13Queries
      .degreeHistogram(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val nEdges = Tables.t(spark, TestSpark.sfDir, "orders")
      .join(Tables.t(spark, TestSpark.sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct().count()
    Seq("cust", "supp").foreach { side =>
      val mass = hist.filter(_._1 == side)
        .map { case (_, d, c) => d * c }.sum
      assert(mass === nEdges, side)
    }
    // bipartite sanity: suppliers are far fewer, so their degrees
    // run higher than customer degrees
    val maxCust = hist.filter(_._1 == "cust").map(_._2).max
    val maxSupp = hist.filter(_._1 == "supp").map(_._2).max
    assert(maxSupp >= maxCust)
  }

  test("mutual knn graph matches an exact driver replay of the " +
      "SRP-bucketed top-3") {
    val out = operators.Ext13Queries.knnGraph(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // replay: same ±1 planes, same sequential float->double fold,
    // same round-half-up to 6
    val planes = (0 until 6).map(p => (0 until 64)
      .map(j => operators.Similarity.planeComponent(p, j).toFloat)
      .toArray)
    def bucket(v: Array[Float]): String = planes.map { pl =>
      var s = 0.0
      var i = 0
      while (i < v.length) {
        s += v(i).toDouble * pl(i).toDouble; i += 1
      }
      if (s >= 0) "1" else "0"
    }.mkString
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byBucket = vecs.groupBy(v => bucket(v._2))
    val nrm = vecs.map { case (id, v) =>
      id -> math.sqrt(dot(v, v))
    }.toMap
    val vmap = vecs.toMap
    val top3 = vecs.map { case (id, v) =>
      val mates = byBucket(bucket(v)).filter(_._1 != id)
      id -> mates.map { case (mid, mv) =>
        (mid, r6(dot(v, mv) / (nrm(id) * nrm(mid))))
      }.sortBy { case (mid, s) => (-s, mid) }.take(3).toSeq
    }.toMap
    val expected = top3.toSeq.flatMap { case (a, ns) =>
      ns.collect {
        case (b, s) if a < b && top3(b).exists(_._1 == a) => (a, b, s)
      }
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq === expected)
    assert(out.nonEmpty)
  }

  test("vad spans partition the active frames exactly") {
    val frames = operators.Ext11Queries
      .energyFrames(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val spans = operators.Ext13Queries.vadSpans(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(spans.nonEmpty)
    // replay: group consecutive (stride-2) active frames per media
    val expected = frames.filter(_._4).groupBy(_._1).toSeq
      .flatMap { case (m, fs) =>
        val sorted = fs.sortBy(_._2)
        val groups = sorted.foldLeft(List.empty[List[(Long, Long)]]) {
          case (acc, f) => acc match {
            case (cur @ ((lastNo, _) :: _)) :: rest
                if f._2 == lastNo + 2 =>
              ((f._2, f._3) :: cur) :: rest
            case _ => List((f._2, f._3)) :: acc
          }
        }.map(_.reverse)
        groups.map(g => (m, g.head._1, g.last._1, g.length.toLong,
          g.map(_._2).sum))
      }.sortBy(s => (s._1, s._2))
    assert(spans.toSeq === expected)
    // spans cover every active frame exactly once
    assert(spans.map(_._4).sum === frames.count(_._4).toLong)
  }

  test("cluster-size histogram conserves the document count") {
    val hist = operators.Ext13Queries
      .clusterSizes(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = Tables.t(spark, TestSpark.sfDir, "documents").count()
    assert(hist.map { case (m, c) => m * c }.sum === nDocs)
    // components have >= 2 members, so the singleton row is alone
    assert(hist.count(_._1 == 1L) === 1)
    // histogram agrees with the labeling it reports on
    val cc = operators.ExtQueries
      .dedupClusters(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(1))
    val rep = cc.groupBy(identity).values.map(_.size)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    hist.filter(_._1 > 1L).foreach { case (m, c) =>
      assert(rep(m.toInt) === c, s"size $m")
    }
  }

  test("mode per group matches a driver count replay") {
    val out = operators.Ext13Queries
      .modePerGroup(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val raw = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag"),
        expr("cast(round(l_quantity) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = raw.groupBy(_._1).toSeq.map { case (g, rs) =>
      val (qty, n) = rs.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.minBy { case (q, c) => (-c, q) }
      (g, qty, n)
    }.sortBy(_._1)
    assert(out.toSeq === expected)
  }

  test("zipf fit matches a driver regression replay and has a " +
      "zipf-shaped slope") {
    val row = Ext13Queries.zipfFit(spark, TestSpark.sfDir).collect()
      .head
    val (n, slope, intercept) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val counts = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.trim.split("\\s+")).map(_.toLowerCase)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    assert(n === math.min(1000L, counts.length.toLong))
    val top = counts.sortBy { case (t, c) => (-c, t) }.take(1000)
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.round(math.log(i + 1.0) * 1e6),
        math.round(math.log(c.toDouble) * 1e6))
    }
    val nn = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val repSlope = (nn.toDouble * sxy - sx.toDouble * sy) /
      (nn.toDouble * sxx - sx.toDouble * sx)
    val repIcept = (sy.toDouble - repSlope * sx) / nn.toDouble
    assert(math.abs(slope - repSlope) < 1e-5)
    assert(math.abs(intercept - repIcept) < 1e-5)
    // counts are rank-sorted, so the fit is strictly decreasing; the
    // synthetic fixture's spectrum is much flatter than natural
    // language (-0.18 at sf0.001 vs ~-1 for real text) — exactly the
    // corpus-health signal this audit exists to surface
    assert(slope < 0.0 && slope > -3.0, s"slope $slope")
  }

  test("readability counts match a per-document regex replay") {
    val out = Ext13Queries.readability(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach { case (id, nSent, nWords, syl, flesch) =>
      val text = docs(id)
      val sents = text.split("[.!?]+", -1).count(_.trim.nonEmpty)
      assert(nSent === math.max(sents, 1), s"doc $id sentences")
      val words = text.trim.split("\\s+")
      assert(nWords === words.length, s"doc $id words")
      val sylRep = words.map(w =>
        math.max(1, "[aeiou]+".r.findAllIn(w.toLowerCase).size).toLong)
        .sum
      assert(syl === sylRep, s"doc $id syllables")
      val rep = 206.835 - 1.015 * (nWords.toDouble / nSent) -
        84.6 * (syl.toDouble / nWords)
      assert(math.abs(flesch - rep) < 1e-5, s"doc $id flesch")
    }
  }
}
