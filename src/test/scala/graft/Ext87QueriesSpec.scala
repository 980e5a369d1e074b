package graft

import graft.operators.{Ext87Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver replays for the round-11 batch: rescaled-range Hurst
  * (exact per-block R/S recomputation), full core decomposition
  * (against a classic min-degree peel — proving the fixed h-index
  * iteration count has CONVERGED, not just that both engines agree
  * on an unconverged value), and rotated PQ (orthonormality of the
  * integer-lattice Hadamard rotation).
  */
class Ext87QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hurst: exact R/S replay for every window; log2(R/S) grows " +
      "with window size and H lands in (0, 1.2)") {
    val series = operators.Ext84Queries
      .hourlySeries(spark, TestSpark.sfDir)
      .orderBy("hr").collect().map(_.getLong(1))
    val got = Ext87Queries.hurst(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet === Set(8L, 16L, 32L, 64L))
    Seq(8, 16, 32, 64).foreach { w =>
      val blocks = series.grouped(w).filter(_.length == w).toSeq
      val rsMicros = blocks.map { b =>
        val s = b.sum; val sxx = b.map(x => x * x).sum
        val cums = b.scanLeft(0L)(_ + _).tail
        val devs = cums.zipWithIndex.map { case (c, i) =>
          w * c - (i + 1) * s }
        val rp = devs.max - devs.min
        math.round(rp.toDouble /
          math.sqrt(math.max(w.toLong * sxx - s * s, 1L).toDouble)
          * 1e6)
      }
      val (nBlocks, meanRs, _, _) = got(w.toLong)
      assert(nBlocks === blocks.size.toLong)
      assert(meanRs === rsMicros.sum / rsMicros.size)
    }
    // self-similarity sanity: R/S grows with window, H plausible
    val l = Seq(8L, 16L, 32L, 64L).map(w => got(w)._3)
    assert(l.sliding(2).forall(p => p(1) > p.head),
      "log2(R/S) must increase with window size")
    val h = got(8L)._4
    assert(h > 0L && h < 1200000L, s"implausible Hurst micro $h")
  }

  test("core decomposition: the fixed h-index iteration count has " +
      "converged — coreness matches a classic min-degree peel") {
    val edges = NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).distinct
    // reference coreness: repeatedly remove a minimum-degree node;
    // coreness(v) = max over the removal sequence of min-degree seen
    // up to v's removal (the textbook O(E) peel, driver-side)
    val adj = edges.groupBy(_._1).map { case (u, es) =>
      u -> scala.collection.mutable.Set(es.map(_._2): _*) }
    val degs = scala.collection.mutable.Map(
      adj.map { case (u, s) => u -> s.size }.toSeq: _*)
    val expected = scala.collection.mutable.Map.empty[Long, Int]
    var level = 0
    while (degs.nonEmpty) {
      val (u, d) = degs.minBy { case (n, dd) => (dd, n) }
      level = math.max(level, d)
      expected(u) = level
      degs.remove(u)
      adj(u).foreach { v =>
        if (degs.contains(v)) { degs(v) = degs(v) - 1; adj(v) -= u }
      }
    }
    val got = Ext87Queries
      .coreDecomposition(spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === expected.keySet.toSet)
    got.foreach { case (node, (deg, core)) =>
      assert(core === expected(node).toLong,
        s"node $node: h-index coreness $core != peel ${expected(node)}")
      assert(core <= deg)
    }
    // the fixture must be non-trivial: at least two distinct core
    // levels, or the convergence claim is vacuous
    assert(got.values.map(_._2).toSet.size >= 2,
      "degenerate fixture: single core level")
  }

  test("opq rotation: exactly orthonormal on the quantized lattice " +
      "and ADC output is well-formed") {
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .limit(16)
      .select(col("vec_id"),
        transform(col("embedding"), x =>
          round(x.cast("double") * 1e6).cast("long")).as("xq"),
        Ext87Queries.hadamardRot(col("embedding"), 64).as("rv"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray,
        r.getSeq[Long](2).toArray))
    emb.foreach { case (_, xq, rv) =>
      // Parseval for ±1 Hadamard: ||Hx||² = 64·||x||², EXACTLY in
      // integer arithmetic — no tolerance, the whole point of
      // keeping the rotation on the lattice
      val n1 = xq.map(BigInt(_)).map(x => x * x).sum * 64
      val n2 = rv.map(BigInt(_)).map(x => x * x).sum
      assert(n1 == n2, s"rotation changed the norm: $n1 vs $n2")
    }
    // pairwise distance preservation (the property PQ quantizes)
    val (_, v0, r0) = emb(0); val (_, v1, r1) = emb(1)
    val d1 = v0.map(BigInt(_)).zip(v1.map(BigInt(_)))
      .map { case (a, b) => (a - b) * (a - b) }.sum * 64
    val d2 = r0.map(BigInt(_)).zip(r1.map(BigInt(_)))
      .map { case (a, b) => (a - b) * (a - b) }.sum
    assert(d1 == d2)
    val out = Ext87Queries.simAnnOpq(spark, TestSpark.sfDir).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L to 7L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to 5))
      assert(rows.forall(_.getLong(2) >= 0L))
      assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
    }
  }
}
