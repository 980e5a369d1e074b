package graft

import graft.operators.Ext68Queries
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the binary-quantization / matryoshka batch. */
class Ext68OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary ANN: 5 results per query, hamming in [0,64] " +
    "non-decreasing by rank, and recall beats chance") {
    val got = Ext68Queries.annBinary(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byQ = got.groupBy(_._1)
    assert(byQ.size === 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q")
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq === (1L to 5L), s"query $q ranks")
      assert(sorted.map(_._3).toSeq ===
        sorted.map(_._3).sorted.toSeq, s"query $q hamming order")
      rs.foreach(r => assert(r._3 >= 0L && r._3 <= 64L))
    }
    // 1-bit quantization must still carry signal: 5 random picks from
    // a ~500-vector corpus would land ~0.4 exact-top5 hits across the
    // 40 slots; require ~10x chance (the synthetic embeddings are
    // near-isotropic, so absolute recall is legitimately modest)
    val hits = got.map(_._5).sum
    assert(hits >= 4L, s"BQ recall collapsed: $hits/40 exact-top5 hits")
  }

  test("matryoshka: 16-dim prefix retrieval is rank-exact, flags " +
    "audit against the full-dim top-5") {
    val got = Ext68Queries.matryoshka(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val byQ = got.groupBy(_._1)
    assert(byQ.size === 8)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 5, s"query $q")
      val sorted = rs.sortBy(_._3)
      // sims non-increasing by rank (ties broken by id upstream)
      assert(sorted.map(_._4).toSeq ===
        sorted.map(_._4).sortBy(-_).toSeq, s"query $q sim order")
    }
    assert(got.forall(r => r._5 == 0L || r._5 == 1L))
    // prefix dims carry signal but are NOT the full ranking: overlap
    // strictly between ~10x chance and perfection across the 40 slots
    val hits = got.map(_._5).sum
    assert(hits >= 4L, s"prefix recall collapsed: $hits/40")
    assert(hits < 40L,
      "prefix ranking identical to full-dim ranking — fixture too easy")
  }
}
