package graft

import graft.operators.Ext74Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext74QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("regression metrics replay from a driver-side recompute") {
    val rows = Ext74Queries.regressionMetrics(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .selectExpr("event_id", "event_type",
        "cast(round(value * 1000) as bigint) as vm")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fit = ev.filter(_._1 % 2 == 0).groupBy(_._2)
      .map { case (et, xs) => et -> xs.map(_._3).sum / xs.size }
    rows.foreach { r =>
      val et = r.getString(0)
      val pred = fit(et)
      assert(r.getLong(2) === pred, s"pred for $et")
      val test = ev.filter(x => x._1 % 2 == 1 && x._2 == et)
        .map(_._3)
      assert(r.getLong(3) === test.size.toLong)
      val sae = test.map(v => math.abs(v - pred)).sum
      val sse = test.map(v => (v - pred) * (v - pred)).sum
      assert(r.getLong(4) === sae, s"sae for $et")
      assert(r.getLong(5) === sse, s"sse for $et")
      assert(r.getLong(6) === sae * 1000000L / test.size)
      val rmse = math.rint(
        math.sqrt(sse.toDouble / test.size) * 1e6) / 1e6
      assert(math.abs(r.getDouble(7) - rmse) < 1e-9, s"rmse for $et")
      // R² of a sane mean predictor on held-out data: bounded above
      // by 1, and NOT degenerate for this fixture
      assert(!r.isNullAt(8))
      assert(r.getDouble(8) <= 1.0)
    }
  }

  test("source KL is non-negative (Gibbs) up to per-term " +
      "quantization, and a uniform-ish fixture stays small") {
    val rows = Ext74Queries.sourceKl(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val types = r.getLong(2)
      // each term is rounded to the micro lattice: the exact KL is
      // >= 0, so the quantized sum is >= -types/2 micro-nats
      assert(r.getLong(3) >= -types,
        s"KL(${r.getString(0)}) broke the Gibbs bound")
    }
  }

  test("PSI: identical halves score ~0; a shifted replay matches " +
      "the closed form") {
    val rows = Ext74Queries.distributionPsi(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the synthetic generator is day-stationary: the TRUE PSI is 0,
      // but at this spec's tiny SF (~100 events per half) sampling
      // noise of order bins/n ≈ 0.1 is expected — assert the score
      // stays in the noise band (well under the 0.25 "broken" bar
      // would be data-dependent; 0.5 catches real regressions), and
      // never below the -10-term quantization floor
      assert(r.getLong(3) < 500000L,
        s"${r.getString(0)} drifted far beyond small-sample noise")
      assert(r.getLong(3) >= -10L)
    }
    // driver replay of one type's PSI, identical smoothing
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .selectExpr("cast(ts div 86400000000000 as bigint) as day",
        "event_type",
        "least(cast(round(value * 1000) as bigint) div 20000, 9) as bin")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val mid = (ev.map(_._1).min + ev.map(_._1).max) / 2
    val et = rows.head.getString(0)
    val mine = ev.filter(_._2 == et)
    val c1 = mine.filter(_._1 <= mid).groupBy(_._3)
      .map { case (b, xs) => b -> xs.size.toLong }
    val c2 = mine.filter(_._1 > mid).groupBy(_._3)
      .map { case (b, xs) => b -> xs.size.toLong }
    val (n1, n2) = (c1.values.sum, c2.values.sum)
    val want = (0L until 10L).map { b =>
      val (a, c) = (c1.getOrElse(b, 0L) + 1, c2.getOrElse(b, 0L) + 1)
      math.rint((a.toDouble / (n1 + 10) - c.toDouble / (n2 + 10)) *
        math.log(a.toDouble * (n2 + 10) / ((n1 + 10).toDouble * c)) *
        1e6).toLong
    }.sum
    assert(rows.head.getLong(3) === want)
  }

  test("byte fallback: replay on a token sample; expansion >= 1") {
    val rows = Ext74Queries.byteFallback(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(1)) // emitted >= tokens
      assert(r.getLong(5) >= 1000000L) // expansion ratio >= 1
      assert(r.getLong(2) <= r.getLong(1)) // oov <= tokens
    }
    // replay: per-lang emitted ids from a driver-side recompute
    val toks = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("lang"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("lang"), lower(col("tok")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val vocab = toks.groupBy(_._2).map { case (tk, xs) =>
      tk -> xs.size }.toSeq
      .sortBy { case (tk, n) => (-n, tk) }.take(256).map(_._1).toSet
    val emitted = toks.groupBy(_._1).map { case (lang, xs) =>
      lang -> xs.map { case (_, tk) =>
        if (vocab(tk)) 1L else tk.length.toLong }.sum
    }
    rows.foreach { r =>
      assert(r.getLong(3) === emitted(r.getString(0)),
        s"emitted for ${r.getString(0)}")
    }
  }

  test("HLL intersection: estimates track exact within raw-HLL " +
      "error; union sketch bounds both sides") {
    val rows = Ext74Queries.hllIntersection(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ea, eb, eu) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (ei, exact) = (r.getLong(4), r.getLong(5))
      assert(ei === ea + eb - eu) // inclusion-exclusion identity
      // the union sketch is the registerwise max, so its estimate
      // sits at-or-above each side's up to the LC/raw regime switch
      // (10% slack covers the boundary)
      assert(eu * 10 >= ea * 9 && eu * 10 >= eb * 9)
      // with the linear-counting small-range switch, each estimate
      // carries ~6.5%-of-cardinality error; inclusion-exclusion sums
      // three of them — accept 25% of the union plus small-set slack
      assert(math.abs(ei - exact) <= eu / 4 + 30L,
        s"day ${r.getLong(0)}: est $ei vs exact $exact (union $eu)")
    }
  }

  test("audio fingerprint: shared-landmark counts replay for the " +
      "top pair") {
    val rows = Ext74Queries.audioFingerprint(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    // driver replay of the full landmark pipeline
    val energies = graft.operators.Ext11Queries
      .energyFrames(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val lms: Map[Long, Set[Long]] = energies.map { case (m, fs) =>
      val s = fs.sortBy(_._2)
      val peaks = s.indices.drop(1).dropRight(1).collect {
        case i if s(i)._3 > s(i - 1)._3 && s(i)._3 > s(i + 1)._3 &&
          s(i)._3 > 64L * 1500L => (s(i)._2, s(i)._3 / 20000)
      }
      m -> (for {
        (f1, b1) <- peaks; (f2, b2) <- peaks
        dt = f2 - f1 if dt >= 2 && dt <= 8
      } yield b1 * 10000L + b2 * 100L + dt).toSet
    }
    val keyCount = lms.values.toSeq.flatMap(_.toSeq)
      .groupBy(identity).map { case (k, xs) => k -> xs.size }
    val good = keyCount.filter { case (_, n) => n >= 2 && n <= 32 }
      .keySet
    val top = rows.head
    val (a, b) = (top.getLong(0), top.getLong(1))
    val want = (lms(a).intersect(lms(b)).intersect(good)).size.toLong
    assert(top.getLong(2) === want)
    assert(rows.map(_.getLong(2)).toSeq ===
      rows.map(_.getLong(2)).toSeq.sorted.reverse)
  }

  test("Borůvka hook: each node's edge is its true minimum; star " +
      "labels are component-consistent") {
    val rows = Ext74Queries.boruvkaHook(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val pairs = graft.operators.NearDupGraph
      .simhashPairs5(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val adj = (pairs.map(p => (p._1, (p._3, p._2))) ++
      pairs.map(p => (p._2, (p._3, p._1))))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).min }
    rows.foreach { case (node, mate, w, _) =>
      assert(adj(node) === ((w, mate)), s"hook for $node")
    }
    // star label: min over {l1(node), l1(mate)} with l1 = min(v, mate)
    val l1 = rows.map(r => r._1 -> math.min(r._1, r._2)).toMap
    rows.foreach { case (node, mate, _, sl) =>
      assert(sl === math.min(l1(node), l1(mate)), s"label for $node")
      assert(sl <= node)
    }
  }

  test("user similarity: anchor's top match replays exactly") {
    val rows = Ext74Queries.userSimilarity(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val counts = Tables.t(spark, TestSpark.sfDir, "events")
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def vec(u: Long) = counts.filter(_._1 == u)
      .map(x => x._2 -> x._3).toMap
    val users = counts.map(_._1).distinct
    val q = rows.head.getLong(0)
    val qv = vec(q)
    val qn = math.sqrt(qv.values.map(v => v * v).sum.toDouble)
    val best = users.filter(_ != q).map { u =>
      val uv = vec(u)
      val dot = qv.keys.map(k => qv(k) * uv.getOrElse(k, 0L)).sum
      val sim = math.rint(dot / (qn * math.sqrt(
        uv.values.map(v => v * v).sum.toDouble)) * 1e6) / 1e6
      (sim, -u, dot, u)
    }.max
    assert(rows.head.getLong(2) === best._4) // n_id
    assert(rows.head.getLong(3) === best._3) // dot
    assert(rows.head.getDouble(4) === best._1) // sim
    // ranks are 1..5 per anchor
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 5L))
    }
  }

  test("cluster medoid: min total edge weight within each CC, " +
      "driver-replayed") {
    val rows = Ext74Queries.clusterMedoid(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val pairs = graft.operators.NearDupGraph
      .simhashPairs5(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver CC via union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val wsum = (pairs.map(p => (p._1, p._3)) ++
      pairs.map(p => (p._2, p._3)))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).sum }
    val byCluster = wsum.keys.groupBy(find)
    val want = byCluster.map { case (_, members) =>
      val ms = members.toSeq
      val medoid = ms.map(m => (wsum(m), m)).min
      (ms.map(find).head, medoid._2, medoid._1, ms.size.toLong)
    }.toSet
    // cluster label convention: min member id (both sides)
    val wantByMin = byCluster.map { case (root, members) =>
      val ms = members.toSeq
      val medoid = ms.map(m => (wsum(m), m)).min
      (ms.min, medoid._2, medoid._1, ms.size.toLong)
    }.toSet
    assert(rows.toSet === wantByMin || rows.toSet === want)
    assert(rows.exists(_._4 > 2), "fixture needs a >2-member cluster")
  }

  test("source KL: a replayed single-source divergence matches") {
    // driver replay for one source, exact same quantization
    val st = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("source"), lower(col("tok")).as("tok"))
      .groupBy("source", "tok").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = st.map(_._3).sum
    val cTok = st.groupBy(_._2).map { case (tk, xs) =>
      tk -> xs.map(_._3).sum }
    val src = st.map(_._1).min
    val mine = st.filter(_._1 == src)
    val nS = mine.map(_._3).sum
    val want = mine.map { case (_, tk, c) =>
      math.rint(c.toDouble / nS *
        math.log(c.toDouble * n / (nS.toDouble * cTok(tk))) * 1e6)
        .toLong
    }.sum
    val got = Ext74Queries.sourceKl(spark, TestSpark.sfDir)
      .filter(col("source") === src).head()
    assert(got.getLong(1) === nS)
    assert(got.getLong(3) === want)
  }
}
