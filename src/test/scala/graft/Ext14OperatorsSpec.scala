package graft

import graft.operators.{CdcQueries, Ext14Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the graph-metric /
  * retrieval-eval / time-travel batch: the clustering coefficient and
  * link-prediction arithmetic on hand-built graphs with known closed
  * forms, metric-definition replays for MRR/NDCG, and the snapshot-at
  * endpoints (cut = max collapses to apply-all, cut < min to state0).
  */
class Ext14OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("clustering coefficient exact on a hand-built graph") {
    import spark.implicits._
    // 4-cycle 1-2-3-4 plus diagonal 1-3: triangles (1,2,3), (1,3,4).
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("a", "b")
    val got = Ext14Queries.clusteringFromPairs(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2L, 666666L), // 2·2/(3·2) = 2/3
      (2L, 2L, 1L, 1000000L), // closed pair
      (3L, 3L, 2L, 666666L),
      (4L, 2L, 1L, 1000000L)))
  }

  test("clustering coefficient on data: bounds and clique consistency") {
    val rows = Ext14Queries.clusteringCoeff(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (deg, tri, cc) =>
      assert(deg >= 1)
      assert(cc >= 0 && cc <= 1000000)
      // triangles through a node cannot exceed its wedge count
      assert(2 * tri <= deg * (deg - 1))
      if (deg < 2) assert(cc === 0L)
    }
  }

  test("link prediction exact on a hand-built bipartite graph") {
    import spark.implicits._
    // items: p1 {A,B} (deg 2), p2 {A,B,C,D} (deg 4), hub {A,B,...}
    // with deg 5 > maxDeg=4 pruned.
    val edges = (Seq(("p1", "A"), ("p1", "B"),
      ("p2", "A"), ("p2", "B"), ("p2", "C"), ("p2", "D")) ++
      (1 to 5).map(i => ("hub", s"${('A' + i - 1).toChar}")))
      .toDF("item", "node")
    val got = Ext14Queries.linkPredictFromEdges(edges, maxDeg = 4)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // A,B share p1 (1e9/2) and p2 (1e9/4): ra = 750000000, common 2;
    // all other pairs share only p2: ra = 250000000.
    assert(got.head === ("A", "B", 2L, 750000000L))
    assert(got.length === 6) // C(4,2) pairs within p2's members
    got.tail.foreach { case (_, _, c, ra) =>
      assert(c === 1L && ra === 250000000L)
    }
  }

  test("retrieval metrics: definition replay from the ranked run") {
    val out = Ext14Queries.evalMrrNdcg(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    out.foreach { case (_, nRel, firstRank, rr, ndcg) =>
      assert(nRel > 0, "every benchmark query should have relevant docs")
      assert(firstRank >= 1)
      assert(rr === 1000000L / firstRank)
      assert(ndcg >= 0 && ndcg <= 1000000)
      // a first-ranked relevant doc forces both metrics positive
      if (firstRank == 1) assert(rr === 1000000L && ndcg > 0)
    }
  }

  test("snapshot-at endpoints: apply-all and state0") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val all = CdcQueries.snapshotAtCut(spark, dir,
      Seq(Long.MaxValue).toDF("cut")).collect().toSeq
    val upsert = CdcQueries.queries("cdc_apply_upsert")(spark, dir)
      .collect().toSeq
    assert(all === upsert,
      "cut = +inf must equal the unbounded apply")
    val none = CdcQueries.snapshotAtCut(spark, dir,
      Seq(-1L).toDF("cut")).collect().toSeq
    // cut below min seq: no delta survives, snapshot == state0
    // (reconstructed here from its definition: per-user aggregate of
    // even-event_id rows)
    val state0 = Tables.t(spark, dir, "events")
      .filter(col("event_id") % 2 === 0)
      .groupBy(col("user_id"))
      .agg(max(col("event_type")).as("event_type"),
        max(round(col("value") * 1000).cast("long")).as("value_milli"))
      .orderBy("user_id").collect().toSeq
    assert(none === state0, "cut < min seq must collapse to state0")
    val mid = CdcQueries.queries("cdc_snapshot_at")(spark, dir)
      .collect().toSeq
    assert(mid.nonEmpty)
  }

  test("ivm distinct equals a from-scratch recompute") {
    val dir = TestSpark.sfDir
    val got = Ext14Queries.ivmDistinct(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // full recompute straight from the LWW definition
    val ev = Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint) div 100").as("bv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val live = ev.groupBy(_._2).map { case (_, rows) =>
      rows.maxBy(_._1)
    }.filter(_._1 % 7 != 0).toSeq
    val expected = live.groupBy(_._3).map { case (g, rows) =>
      (g, rows.map(_._4).distinct.size.toLong, rows.size.toLong)
    }.toSeq.sortBy(_._1)
    assert(got === expected)
  }

  test("shot boundaries: frame conservation and segment contiguity") {
    val segs = Ext14Queries.shotBoundaries(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(segs.nonEmpty)
    segs.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_._2)
      // segments number 1..k, start at the media's first frame, and
      // tile the frame axis without overlap
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3)
        case _ =>
      }
      sorted.foreach { s => assert(s._3 <= s._4 && s._5 >= 1) }
    }
  }

  test("gini matches the exact driver formula") {
    val out = Ext14Queries.giniActivity(spark, TestSpark.sfDir)
      .collect().head
    val counts = Tables.t(spark, TestSpark.sfDir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1)).map(_._2)
    val n = counts.length.toLong
    val total = counts.sum
    val iw = counts.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    assert(out.getLong(0) === n)
    assert(out.getLong(1) === total)
    assert(out.getLong(2) ===
      ((2 * iw - (n + 1) * total) * 1000000L) / (n * total))
    val top = counts.takeRight((n / 10).toInt).sum
    assert(out.getLong(3) === top * 1000000L / total)
  }

  test("markov entropy: exact replay, funnel states at zero") {
    val out = Ext14Queries.markovEntropy(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    // replay: collect the transition pairs and recompute on the driver
    val trans: Seq[(String, String)] =
      Tables.t(spark, TestSpark.sfDir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .groupBy(_._1).values.toSeq.flatMap { rows =>
          val ts = rows.sortBy(_._2).map(_._3).toList
          ts.zip(ts.drop(1))
        }
    val pairs = trans.groupBy(x => x).map { case ((f, t0), xs) =>
      (f, t0, xs.size.toLong)
    }
    val expected = pairs.groupBy(_._1).map { case (f, ns) =>
      val ftot = ns.map(_._3).sum
      val sumN = ns.map(n =>
        n._3 * math.round(math.log(n._3.toDouble) * 1e6)).sum
      (f, ns.size.toLong, ftot,
        math.round(math.log(ftot.toDouble) * 1e6) - sumN / ftot)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq === expected)
    out.foreach { case (_, nOut, _, h) =>
      assert(h >= 0)
      // H <= ln(branching factor), up to two lattice roundings
      assert(h <= math.round(math.log(nOut.toDouble) * 1e6) + 2)
      if (nOut == 1) assert(h === 0L)
    }
  }

  test("burst days: exact 2-sigma inequality replay") {
    val got = Ext14Queries.burstDays(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSeq
    val counts = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(identity).map { case ((ty, d), xs) =>
        (ty, d, xs.size.toLong) }.toSeq
    val expected = counts.groupBy(_._1).toSeq.flatMap { case (_, ds) =>
      val n = ds.size.toLong
      val s1 = ds.map(_._3).sum
      val s2 = ds.map(d => d._3 * d._3).sum
      ds.filter { case (_, _, c) =>
        val dev = n * c - s1
        dev > 0 && dev * dev > 4 * (n * s2 - s1 * s1)
      }.map { case (ty, d, c) => (ty, d, c, n * c - s1) }
    }.sortBy(t => (t._1, t._2))
    assert(got === expected)
  }

  test("uniqueness audit: declared keys unique, probes duplicated") {
    val m = Ext14Queries.uniqueness(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(m.size === 12)
    // lineitem.pk: the audit EXPOSED that the synthetic generator does
    // NOT enforce (l_orderkey, l_linenumber) uniqueness (6000 rows,
    // 4599 distinct pairs at sf0.001) — exactly the violation class
    // this audit exists to surface, so it is asserted as duplicated.
    val probes = Set("events.user_id", "lineitem.l_orderkey",
      "lineitem.pk")
    m.foreach { case (entity, (nRows, nKeys, dups, maxM)) =>
      if (probes(entity)) {
        assert(dups > 0 && maxM > 1, s"$entity should fan out")
      } else {
        assert(nRows === nKeys && dups === 0L && maxM === 1L,
          s"$entity must be a unique key")
      }
    }
  }

  test("reconciliation: order conservation and bucket bounds") {
    val segs = Ext14Queries.reconciliation(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nOrders = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(segs.map(_._2).sum === nOrders)
    segs.foreach { case (b, n, lo, hi) =>
      assert(b >= -4 && b <= 4)
      assert(n > 0 && lo <= hi)
    }
  }

  test("query routing: cells from the shared fit, scanned adds up") {
    val out = Ext14Queries.queryRouting(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.map(_._1).toSeq.sorted === (0L to 7L))
    // cross-check against the independently-declared cluster sizes
    val sizes = graft.operators.ExtQueries
      .queries("embed_kmeans_clusters")(spark, TestSpark.sfDir)
      .select("cell", "cluster_size").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nTotal = sizes.values.sum
    out.foreach { case (_, c1, c2, scanned, frac) =>
      assert(c1 !== c2)
      assert(scanned ===
        sizes.getOrElse(c1, 0L) + sizes.getOrElse(c2, 0L))
      assert(frac === scanned * 1000000L / nTotal)
      assert(frac > 0 && frac <= 1000000L)
    }
  }

  test("mann-kendall matches the exact driver statistic") {
    val out = Ext14Queries.mannKendall(spark, TestSpark.sfDir)
      .collect().head
    val series = Tables.t(spark, TestSpark.sfDir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')"),
        expr("cast(round(value * 1000) as bigint)"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val s = (for {
      (da, va) <- series; (db, vb) <- series if da < db
    } yield java.lang.Long.signum(vb - va).toLong).sum
    val n = series.length.toLong
    val tieSum = series.groupBy(_._2).values
      .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) })
      .sum
    val varnum = n * (n - 1) * (2 * n + 5) - tieSum
    assert(out.getLong(0) === n)
    assert(out.getLong(1) === s)
    assert(out.getLong(2) === varnum)
    assert(out.getBoolean(3) === (9 * s * s > 2 * varnum))
  }

  test("text diversity: exact replay per source") {
    val out = Ext14Queries.textDiversity(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val toks = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .flatMap(r => r.getString(1).trim.split("\\s+")
        .map(t0 => (r.getString(0), t0.toLowerCase)))
    val expected = toks.groupBy(_._1).map { case (src, xs) =>
      val f = xs.groupBy(_._2).map(_._2.size.toLong).toSeq
      val nT = f.sum; val v = f.size.toLong
      val hapax = f.count(_ == 1L).toLong
      val maxF = f.max
      val sq = f.map(x => x * (x - 1)).sum
      (src, nT, v, v * 1000000L / nT,
        sq * 1000000L / (nT * (nT - 1)),
        hapax * 1000000L / v, maxF * 1000000L / nT)
    }.toSeq.sortBy(_._1)
    assert(out.toSeq === expected)
  }

  test("bpe training matches a full driver replay of three rounds") {
    val got = Ext14Queries.queries("tok_bpe_train3")(spark,
      TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // driver replay: same vocabulary, same selection rule, same
    // left-to-right non-overlapping merge
    var vocab: Seq[(List[String], Long)] =
      Tables.t(spark, TestSpark.sfDir, "documents")
        .select(col("text")).collect()
        .flatMap(_.getString(0).toLowerCase.split("[^a-z]+"))
        .filter(_.length >= 2)
        .groupBy(identity[String]).map { case (w, xs) =>
          (w.toList.map(_.toString), xs.size.toLong)
        }.toSeq
    def bestPair(v: Seq[(List[String], Long)]): (String, String, Long) =
      v.flatMap { case (s, c) =>
        s.zip(s.drop(1)).map(p => (p, c))
      }.groupBy(_._1).map { case ((a, b), xs) =>
        (a, b, xs.map(_._2).sum)
      }.toSeq.minBy { case (a, b, n) => (-n, a, b) }
    def applyMerge(s: List[String], a: String,
        b: String): List[String] = s match {
      case x :: y :: rest if x == a && y == b =>
        (x + y) :: applyMerge(rest, a, b)
      case x :: rest => x :: applyMerge(rest, a, b)
      case Nil => Nil
    }
    val expected = (1 to 3).map { r =>
      val (a, b, n) = bestPair(vocab)
      vocab = vocab.map { case (s, c) => (applyMerge(s, a, b), c) }
      (r.toLong, s"$a|$b", n)
    }
    assert(got === expected)
  }

  test("embedding outliers: rank contract + shared-fit assignment") {
    val out = Ext14Queries.embedOutliers(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length === 20)
    assert(out.map(_._1).toSeq === (1 to 20))
    assert(out.map(_._4).toSeq === out.map(_._4).toSeq.sorted)
    // the outliers' cells agree with the independently-declared
    // whole-corpus assignment (same quantizer fit)
    val cells = graft.operators.ExtQueries
      .queries("embed_kmeans_clusters")(spark, TestSpark.sfDir)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (_, id, cell, _) =>
      assert(cells(id) === cell)
    }
  }

  test("ivf recall curve: monotone in nprobe, np=1 equals sim_ann_ivf") {
    val out = Ext14Queries.ivfRecallCurve(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    assert(out.size === 16)
    (0L to 7L).foreach { q =>
      val (h1, r1) = out((q, 1L))
      val (h2, r2) = out((q, 2L))
      assert(h1 <= 5 && h2 <= 5)
      assert(h2 >= h1, s"probe $q: recall must be monotone in nprobe")
      assert(r1 === h1 * 200000L && r2 === h2 * 200000L)
    }
    // the nprobe=1 leg must agree with the independently-declared
    // sim_ann_ivf top-5 intersected with the exact cosine top-5
    val ivf1 = graft.operators.ExtQueries
      .queries("sim_ann_ivf")(spark, TestSpark.sfDir)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.operators.ExtQueries
      .queries("sim_cosine_topk")(spark, TestSpark.sfDir)
      .filter(col("rank") <= 5).select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L to 7L).foreach { q =>
      val expectHits = (ivf1 & exact).count(_._1 == q).toLong
      assert(out((q, 1L))._1 === expectHits,
        s"probe $q: np=1 hits disagree with sim_ann_ivf ∩ exact")
    }
  }

  test("interval union matches an exact per-user driver replay") {
    val got = Ext14Queries.intervalUnion(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val iv = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000"),
        expr("ts div 1000 + cast(round(value * 1000) as bigint) * 1000"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val expected = iv.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(t0 => (t0._3, t0._4, t0._2))
      var islands = List.empty[(Long, Long)] // (start, maxEnd), rev
      sorted.foreach { case (_, _, s, e) =>
        islands match {
          case (is0, ie0) :: rest if s <= ie0 =>
            islands = (is0, math.max(ie0, e)) :: rest
          case _ => islands = (s, e) :: islands
        }
      }
      val covered = islands.map { case (a, b) => b - a }.sum
      (u, rows.size.toLong, islands.size.toLong, covered,
        sorted.map(_._4).max - sorted.map(_._3).min)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq === expected)
  }

  test("new vs returning: conservation laws") {
    val rows = Ext14Queries.newVsReturning(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val users = Tables.t(spark, TestSpark.sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._3).sum === users,
      "every user is new exactly once")
    rows.foreach { case (_, active, nw, ret) =>
      assert(active === nw + ret && nw >= 0 && ret >= 0)
    }
    // the first day has no returning users
    assert(rows.minBy(_._1)._4 === 0L)
  }

  test("modularity: edge conservation, d_c = 2e_c, label agreement") {
    val rows = Ext14Queries.modularity(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // CC components close over their edges: every edge is internal
    rows.foreach { case (_, n, eC, dC, q) =>
      assert(dC === 2 * eC, "component degree sum must be 2·e_c")
      assert(q >= 0)
      assert(n >= 2)
    }
    // Σ e_c over communities = m (every edge is in exactly one)
    val labels = graft.operators.ExtQueries
      .queries("dedup_clusters")(spark, TestSpark.sfDir)
      .select("id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = graft.operators.ExtQueries
      .queries("dedup_minhash_lsh")(spark, TestSpark.sfDir).count()
    assert(rows.map(_._3).sum === m)
    // community node counts agree with the declared labeling
    val sizes = labels.values.groupBy(identity[Long])
      .map { case (c, xs) => (c, xs.size.toLong) }
    assert(rows.map(r => (r._1, r._2)).toMap === sizes)
  }

  test("mmr rerank: greedy-selection replay and diversity effect") {
    val got = Ext14Queries.mmrRerank(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === (1L to 5L))
    assert(got.map(_._2).distinct.length === 5)
    // replay: shortlist from the declared exact top-k machinery
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
    val short = graft.operators.Similarity
      .cosineTopK(emb, emb.filter(col("vec_id") === 0), "vec_id",
        "embedding", k = 10)
      .select(col("n_id"),
        expr("cast(round(sim * 1000000) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ids = short.map(_._1).toSet
    val pairSim = graft.operators.Similarity
      .cosineTopK(emb.filter(col("vec_id").isin(ids.toSeq: _*)),
        emb.filter(col("vec_id").isin(ids.toSeq: _*)), "vec_id",
        "embedding", k = 9)
      .select(col("q_id"), col("n_id"),
        expr("cast(round(sim * 1000000) as bigint)"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    var chosen = List.empty[(Long, Long)]
    (1 to 5).foreach { r =>
      val cand = short.filterNot(s => chosen.exists(_._1 == s._1))
      val scored = cand.map { case (id, simq) =>
        val pen = if (chosen.isEmpty) 0L
          else chosen.map(c => pairSim((id, c._1))).max
        (id, simq - pen)
      }
      val best = scored.minBy { case (id, sc) => (-sc, id) }
      chosen = chosen :+ best
    }
    assert(got.map(t => (t._2, t._3)).toSeq === chosen)
    // diversity must have reordered or replaced somebody relative to
    // the plain similarity ranking (otherwise the op is a no-op)
    val plain = short.sortBy { case (id, s) => (-s, id) }
      .take(5).map(_._1).toSeq
    assert(got.map(_._2).toSeq !== plain)
  }

  test("tombstone gc: replay from the envelope routing rule") {
    val dir = TestSpark.sfDir
    val got = CdcQueries.queries("cdc_tombstone_gc")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq
    val ev = Tables.t(spark, dir, "events")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cut = ev.map(_._1).max / 2
    val expected = ev.groupBy(_._2).toSeq.flatMap { case (u, rows) =>
      // env rule: %10==0 erase, %10==3 dropped, everything else update
      val tombs = rows.map(_._1).filter(_ % 10 == 0)
      val upds = rows.map(_._1).filter(e => e % 10 != 0 && e % 10 != 3)
      if (tombs.nonEmpty &&
        (upds.isEmpty || tombs.max > upds.max))
        Some((u, tombs.max, tombs.max <= cut))
      else None
    }.sortBy(_._1)
    assert(got === expected)
  }

  test("partition lag: conservation and zero-lag high-water holder") {
    val rows = CdcQueries.queries("cdc_partition_lag")(spark,
      TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._1).toSeq === (0L to 7L))
    val nondrop = Tables.t(spark, TestSpark.sfDir, "events")
      .filter(expr("event_id % 10 != 3")).count()
    assert(rows.map(_._2).sum === nondrop)
    assert(rows.filter(_._4 == 0L).nonEmpty)
    val hwm = rows.map(_._3).max
    rows.foreach { case (_, _, h, lag) => assert(lag === hwm - h) }
  }

  test("tile grid: per-media replay of slicing, hashing, ink count") {
    val grid = Ext14Queries.tileGrid(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getString(3), r.getLong(4))))
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).take(5)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val gm = grid.toMap
    docs.foreach { case (id, text) =>
      val nRows = math.max((text.length + 63) / 64, 1)
      for (row <- 0 until nRows; c <- 0 until 4) {
        val from = row * 64 + c * 16
        val tile = if (from >= text.length) ""
          else text.substring(from,
            math.min(from + 16, text.length))
        if (tile.nonEmpty) {
          val (h, ink) = gm((id, row.toLong, c.toLong))
          assert(h === md5hex(tile))
          assert(ink === tile.count(ch => !ch.isWhitespace).toLong)
        } else assert(!gm.contains((id, row.toLong, c.toLong)))
      }
    }
  }

  test("prefix families: exact replay") {
    val got = Ext14Queries.prefixFamilies(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = Tables.t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        md5hex(r.getString(1).trim.split("\\s+").take(2)
          .mkString(" "))))
      .groupBy(_._2).map { case (h, xs) =>
        (h, xs.size.toLong, xs.map(_._1).min)
      }.filter(_._2 >= 3).toSeq.sortBy(_._1)
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("referential audit: counts and an independent orphan check") {
    val rows = Ext14Queries.referential(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size === 7)
    // child row counts are the raw table counts
    assert(rows("lineitem.orders")._1 ===
      Tables.t(spark, TestSpark.sfDir, "lineitem").count())
    assert(rows("orders.customer")._1 ===
      Tables.t(spark, TestSpark.sfDir, "orders").count())
    // independent orphan computation for one edge via except
    val orphanKeys = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_suppkey")).except(
        Tables.t(spark, TestSpark.sfDir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"))).count()
    assert(rows("lineitem.supplier")._3 === orphanKeys)
    rows.values.foreach { case (n, orph, keys) =>
      assert(orph >= keys && orph <= n)
    }
  }

  test("pq distortion: partition of the corpus, mean <= max") {
    val rows = Ext14Queries.pqDistortion(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val n = Tables.t(spark, TestSpark.sfDir, "embeddings").count()
    (0L to 3L).foreach { m =>
      val sub = rows.filter(_._1 == m)
      assert(sub.map(_._3).sum === n,
        s"subspace $m: codes must partition the corpus")
      assert(sub.map(_._2).distinct.length === sub.length)
      sub.foreach { case (_, cell, _, mean, mx) =>
        assert(cell >= 0 && cell < 8)
        assert(mean >= 0 && mean <= mx)
      }
    }
  }

  test("audience overlap: replay from distinct user sets") {
    val got = Ext14Queries.audienceOverlap(spark, TestSpark.sfDir)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val sets = Tables.t(spark, TestSpark.sfDir, "events")
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (t0, xs) => (t0, xs.map(_._2).toSet) }
    val types = sets.keys.toSeq.sorted
    val expected = (for {
      a <- types; b <- types if a < b
    } yield {
      val (sa, sb) = (sets(a), sets(b))
      val nb = (sa & sb).size.toLong
      ((a, b), (sa.size.toLong, sb.size.toLong, nb,
        nb * 1000000L / (sa.size + sb.size - nb)))
    }).filter(_._2._3 > 0).toMap
    assert(got === expected)
  }

  test("curve compare: row conservation, equal-block dense-grid tie") {
    val rows = Ext14Queries.curveCompare(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq("hilbert", "morton"))
    val n = Tables.t(spark, TestSpark.sfDir, "orders").count()
    rows.foreach { case (_, nBuckets, nRows, mean, mx) =>
      assert(nRows === n)
      assert(nBuckets >= 1 && mean <= mx)
      // 2^16 index range per bucket covers at most a 256x256 block
      assert(mx <= 65536L)
    }
  }

  test("theil-sen matches the exact pairwise-slope median") {
    val out = Ext14Queries.theilSen(spark, TestSpark.sfDir)
      .collect().head
    val series = Tables.t(spark, TestSpark.sfDir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')"),
        expr("cast(round(value * 1000) as bigint)"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, vs) => (d, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val slopes = (for {
      (da, va) <- series; (db, vb) <- series if da < db
    } yield ((vb - va) * 1000000L) / (db - da)).sorted
    assert(out.getLong(0) === series.length.toLong)
    assert(out.getLong(1) === slopes.length.toLong)
    // lower weighted median by the cumulative rule == element at
    // ceil(n/2) of the sorted multiset
    assert(out.getLong(2) === slopes((slopes.length - 1) / 2))
  }
}
