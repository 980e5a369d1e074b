package graft

import graft.operators.{Ext84Queries, Ext87Queries, Ext88Queries}
import org.scalatest.funsuite.AnyFunSuite

/** Driver replays for the round-12 additions: Cochran's Q against an
  * exact BigInt recomputation of the textbook formula over the same
  * ballots, and the OPQ shortlist+rerank composition contract.
  */
class Ext88QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cochran q: matches the exact-rational textbook statistic " +
      "over the collected judge ballots") {
    val votes = Ext84Queries.judgeVotes(spark, TestSpark.sfDir)
      .select("j1", "j2", "j3").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = votes.length.toLong
    val g = Seq(votes.map(_._1).sum, votes.map(_._2).sum,
      votes.map(_._3).sum)
    val nn = g.sum
    val b = votes.map { case (a, bb, c) =>
      val l = a + bb + c; l * l }.sum
    val row = Ext88Queries.cochranQ(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getLong(0) === n)
    assert(Seq(row.getLong(1), row.getLong(2), row.getLong(3)) === g)
    // denominator identity: 3N − ΣL² = 2 · (#split-vote items)
    val splits = votes.count { case (a, bb, c) =>
      val l = a + bb + c; l == 1 || l == 2 }
    assert(row.getLong(4) === splits.toLong)
    val qExact = 2.0 * (3.0 * g.map(x => x.toDouble * x).sum
      - nn.toDouble * nn) / math.max(3 * nn - b, 1L).toDouble
    assert(row.getLong(5) === math.round(qExact * 1e6))
    assert(row.getInt(6) === (if (qExact * 1e6 > 5991000) 1 else 0))
    // the fixture must exercise the statistic: some disagreement
    assert(splits > 0, "degenerate fixture: judges never split")
  }

  test("holt winters: exact driver replay of the seeded seasonal " +
      "recursion, and the forecast is the one-step-ahead prediction") {
    val series = operators.Ext13Queries.dailySeries(spark, TestSpark.sfDir)
      .orderBy("day").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(series.length >= 8, "fixture needs 8+ days")
    def fl2(z: Long): Long = Math.floorDiv(z - Math.floorMod(z, 2), 2)
    val l0 = Math.floorDiv(series.take(7).map(_._2).sum, 7)
    // replay: state = (level, trend, rolling seasonal window)
    var lv = l0; var tr = 0L
    var sv = series.take(7).map(_._2 - l0).toVector
    val expected = scala.collection.mutable.ArrayBuffer.empty[
      (Int, Long, Long, Long, Long, Long)]
    series.take(7).foreach { case (d, y) =>
      expected += ((d, y, l0, 0L, y - l0, y)) }
    series.drop(7).foreach { case (d, y) =>
      val s7 = sv.head
      val f = lv + tr + s7
      val nl = fl2(y - s7 + lv + tr)
      val nb = fl2(nl - lv + tr)
      val ns = fl2(y - nl + s7)
      expected += ((d, y, nl, nb, ns, f))
      lv = nl; tr = nb; sv = sv.tail :+ ns
    }
    val got = operators.Ext88Queries
      .holtWinters(spark, TestSpark.sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expected.toSeq)
    // the statistic must be non-degenerate: the seasonal state moves
    assert(got.drop(7).map(_._5).distinct.length > 1)
  }

  test("opq rerank: top-5 cosine re-rank of the 20-candidate OPQ " +
      "shortlist, exact against a driver-side replay") {
    val out = Ext87Queries.simAnnRerankOpq(spark, TestSpark.sfDir)
      .collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === (0L to 7L).toSet)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to 5))
      // sims descend with rank and never pair a query with itself
      val sorted = rows.sortBy(_.getInt(3))
      assert(sorted.sliding(2).forall(p =>
        p(0).getDouble(2) >= p(1).getDouble(2)))
      assert(rows.forall(r => r.getLong(1) != r.getLong(0)))
    }
    // composition contract: every returned neighbour is in the OPQ
    // ADC 20-shortlist of its query, and its sim equals the exact
    // cosine of the RAW vectors (rotation plays no part in the
    // re-rank leg)
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val expected = BigDecimal(cos(emb(r.getLong(0)), emb(r.getLong(1))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expected) < 2e-6,
        s"sim mismatch for pair ${r.getLong(0)}->${r.getLong(1)}")
    }
  }
}
