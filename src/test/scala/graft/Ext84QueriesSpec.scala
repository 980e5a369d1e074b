package graft

import graft.operators.Ext84Queries
import org.scalatest.funsuite.AnyFunSuite

class Ext84QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exposure fairness: driver replay of the top-10 exposure " +
      "shares; skews sum to ~0 and shares to ~1e6") {
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2)))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val byId = emb.map(t => t._1 -> t._2).toMap
    val labelOf = emb.map(t => t._1 -> t._3).toMap
    // exact top-10 per probe, (sim desc, n_id) tie-break
    val hits = (0L until 8L).flatMap { qid =>
      val qv = byId(qid); val qn = math.sqrt(dot(qv, qv))
      emb.filter(_._1 != qid).map { case (nid, nv, _) =>
        (nid, r6(dot(qv, nv) / (qn * math.sqrt(dot(nv, nv)))))
      }.sortBy { case (nid, s) => (-s, nid) }.take(10).zipWithIndex
        .map { case ((nid, _), i) => (nid, i + 1) }
    }
    def disc(rank: Int): Long =
      math.round(1e6 * math.log(2.0) / math.log(rank + 1.0))
    val expByLabel = hits
      .map { case (nid, rank) => labelOf(nid) -> disc(rank) }
      .groupBy(_._1).map { case (l, xs) =>
        l -> (xs.length.toLong, xs.map(_._2).sum) }
    val expTot = expByLabel.values.map(_._2).sum
    val corpus = emb.groupBy(_._3).map { case (l, xs) =>
      l -> xs.length.toLong }
    val nTot = corpus.values.sum
    val got = Ext84Queries.exposureFairness(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq === corpus.keys.toSeq.sorted)
    got.foreach { case (l, nC, cShare, nH, eShare, skew) =>
      assert(nC === corpus(l))
      assert(cShare === nC * 1000000L / nTot)
      val (wH, wE) = expByLabel.getOrElse(l, (0L, 0L))
      assert(nH === wH, s"n_hits($l)")
      assert(eShare === wE * 1000000L / expTot, s"exp_share($l)")
      assert(skew === eShare - cShare)
    }
    // shares are a partition of ~1e6 (floor-division slack < |labels|)
    val cSum = got.map(_._3).sum
    val eSum = got.map(_._5).sum
    assert(cSum > 1000000L - got.length && cSum <= 1000000L)
    assert(eSum > 1000000L - got.length && eSum <= 1000000L)
    assert(got.map(_._6).sum === eSum - cSum)
    // the audit is non-trivial on this corpus: some group deviates
    assert(got.exists(_._6 != 0L))
  }

  test("ljung-box: driver replay of the gap-filled series, the " +
      "n2-rescaled rho estimator and the cumulative Q") {
    val counts = Tables.t(spark, TestSpark.sfDir, "events")
      .select(org.apache.spark.sql.functions.expr(
        "ts div 3600000000000").as("hr"))
      .groupBy("hr")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = counts.keys.min; val hi = counts.keys.max
    val xs = (lo to hi).map(h => counts.getOrElse(h, 0L)).toArray
    val n = xs.length.toLong
    val s = xs.sum
    val sxx = xs.map(x => x * x).sum
    var cum = 0L
    val want = (1 to 10).map { k =>
      val pairs = (0 until (n - k).toInt)
        .map(t => (xs(t), xs(t + k)))
      val sxh = pairs.map(_._1).sum; val sxt = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val num = n * n * sxy - n * s * (sxh + sxt) + (n - k) * s * s
      val den = n * n * sxx - n * s * s
      val rho = math.round(num.toDouble / den.toDouble * 1e6)
      cum += rho * rho / (n - k)
      (k.toLong, n - k, rho, n * (n + 2) * cum / 1000000L)
    }
    val got = graft.operators.Ext84Queries
      .ljungBox(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === want)
    // Q must be nondecreasing (each term is a square)
    assert(got.map(_._4).toSeq === got.map(_._4).sorted.toSeq)
    // the fixture must contain genuine zero-filled hours, else the
    // gap-fill contract is untested
    assert(counts.size.toLong < n)
  }

  test("fleiss kappa: driver replay of the three judges and the " +
      "exact-integer kappa; the judges genuinely disagree somewhere") {
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select("text", "n_chars").collect()
      .map(r => (r.getString(0).toLowerCase, r.getLong(1)))
    val stop = Set("the", "a", "of", "and", "in", "to", "is")
    val votes = docs.map { case (txt, nChars) =>
      val toks = "[a-z]+".r.findAllIn(txt).toSeq
      val j1 = if (nChars >= 200) 1L else 0L
      val j2 = if (toks.distinct.length * 2 >= toks.length) 1L else 0L
      val j3 = if (toks.count(stop) >= 2) 1L else 0L
      (j1, j2, j3)
    }
    val n = votes.length.toLong
    val s1 = votes.map(v => v._1 + v._2 + v._3).sum
    val a = votes.map { v =>
      val n1 = v._1 + v._2 + v._3
      n1 * (n1 - 1) + (3 - n1) * (2 - n1)
    }.sum
    // N-independent lattice (r9 ADVICE): P̄ₑ from the quantized mean
    // vote rate q1, never from the 9N²-sized moment products
    val pBar = a * 1000000L / (6 * n)
    val q1 = s1 * 1000000L / (3 * n)
    val pE = (q1 * q1 + (1000000L - q1) * (1000000L - q1)) / 1000000L
    val kn = (pBar - pE) * 1000000L
    val kd = math.max(1000000L - pE, 1L)
    val kappa = Math.floorDiv(kn, kd)
    val r = graft.operators.Ext84Queries
      .fleissKappa(spark, TestSpark.sfDir).collect()(0)
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === votes.map(_._1).sum)
    assert(r.getLong(2) === votes.map(_._2).sum)
    assert(r.getLong(3) === votes.map(_._3).sum)
    assert(r.getLong(4) === pBar)
    assert(r.getLong(5) === pE)
    assert(r.getLong(6) === kappa)
    // the statistic is only meaningful if the panel splits somewhere
    assert(votes.exists(v => Set(v._1, v._2, v._3).size > 1))
    assert(r.getLong(4) >= r.getLong(5) - 1000000L)
  }

  test("pacf: Durbin-Levinson replay from the ljung-box rho values; " +
      "lag-1 pacf equals rho1 by construction") {
    val rhos = graft.operators.Ext84Queries
      .ljungBox(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val (r1, r2, r3) = (rhos(1L), rhos(2L), rhos(3L))
    val f22 = math.round(
      (r2 * 1000000L - r1 * r1).toDouble /
        math.max(1000000000000L - r1 * r1, 1L).toDouble * 1e6)
    val f21 = math.round((r1 * (1000000L - f22)).toDouble / 1e6)
    val f33 = math.round(
      (r3 * 1000000L - f21 * r2 - f22 * r1).toDouble /
        math.max(1000000000000L - f21 * r1 - f22 * r2, 1L)
          .toDouble * 1e6)
    val got = graft.operators.Ext84Queries
      .pacf(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, r1, r1), (2L, r2, f22),
      (3L, r3, f33)))
    // all pacf values are genuine correlations
    got.foreach { case (_, rho, p) =>
      assert(math.abs(rho) <= 1000000L)
      assert(math.abs(p) <= 1000000L)
    }
  }

  test("permutation entropy: driver replay of the ordinal patterns " +
      "and the quantized entropy; bounded by ln(6)") {
    val counts = Tables.t(spark, TestSpark.sfDir, "events")
      .select(org.apache.spark.sql.functions.expr(
        "ts div 3600000000000").as("hr"))
      .groupBy("hr")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = counts.keys.min; val hi = counts.keys.max
    val xs = (lo to hi).map(h => counts.getOrElse(h, 0L)).toArray
    def rank(v: Array[Long], i: Int): Long =
      v.indices.count(j => j != i &&
        (v(j) < v(i) || (v(j) == v(i) && j < i))).toLong
    val pats = xs.sliding(3).filter(_.length == 3).map { w =>
      rank(w, 0) * 9 + rank(w, 1) * 3 + rank(w, 2)
    }.toSeq
    val hist = pats.groupBy(identity)
      .map { case (p, v) => p -> v.length.toLong }
    val nTri = pats.length.toLong
    def lnq(x: Long) = math.round(math.log(x.toDouble) * 1e6)
    val sumNlnn = hist.values.map(n => n * lnq(n)).sum
    val h = lnq(nTri) - sumNlnn / nTri
    val got = graft.operators.Ext84Queries
      .permEntropy(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._1).toSeq === hist.keys.toSeq.sorted)
    got.foreach { case (p, n, share, hm) =>
      assert(n === hist(p))
      assert(share === n * 1000000L / nTri)
      assert(hm === h)
    }
    // entropy of a 6-symbol alphabet is bounded by ln 6
    assert(h >= 0 && h <= math.round(math.log(6.0) * 1e6))
    // the fixture exercises more than one pattern (else the measure
    // demonstrates nothing)
    assert(hist.size > 1)
  }

  test("anisotropy: driver replay of the consecutive-pair cosines " +
      "and the mean-vector energy share") {
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray.map(x =>
          math.round(x.toDouble * 1000)))
      .sortBy(_._1)
    val n = emb.length.toLong
    val d = emb.head._2.length
    val sumS1sq = (0 until d).map { i =>
      val s1 = emb.map(_._2(i)).sum; s1 * s1 }.sum
    val sumS2 = emb.map(_._2.map(x => x * x).sum).sum
    val byId = emb.toMap
    val cosines = emb.map(_._1).filter(id => byId.contains(id + 1))
      .map { id =>
        val (a, b) = (byId(id), byId(id + 1))
        val dot = a.zip(b).map { case (x, y) => x * y }.sum
        math.round(dot.toDouble /
          (math.sqrt(a.map(x => x * x).sum.toDouble) *
            math.sqrt(b.map(x => x * x).sum.toDouble)) * 1e6)
      }
    val r = graft.operators.Ext84Queries
      .anisotropy(spark, TestSpark.sfDir).collect()(0)
    assert(r.getLong(0) === n)
    assert(r.getLong(1) === cosines.length.toLong)
    assert(r.getLong(2) ===
      Math.floorDiv(cosines.sum, cosines.length.toLong))
    assert(r.getLong(3) === math.round(
      sumS1sq.toDouble / (n.toDouble * sumS2.toDouble) * 1e6))
    // a synthetic clustered corpus is measurably anisotropic but not
    // degenerate
    assert(r.getLong(3) > 0 && r.getLong(3) < 1000000L)
    assert(math.abs(r.getLong(2)) < 1000000L)
  }
}
