package graft

import graft.operators.{Ext85Queries, ExtQueries, NearDupGraph, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver replays for the round-10 batch: sampled-Brandes betweenness
  * (exact BFS + floored dependency accumulation recomputed in Scala),
  * the IVF nCells recall curve (cross-checked against the already-
  * oracle-gated sim_ann_ivf output), and per-source self-BLEU-2 (full
  * clip-table replay).
  */
class Ext85QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("betweenness: exact Brandes replay (radius 3, relay-capped, " +
      "8 hash pivots) matches the query row for row") {
    val edges = NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
      .select("id_a", "id_b").collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)),
        (r.getLong(1), r.getLong(0)))).distinct
    val adj = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._2).toSet }
    val relay = adj.filter(_._2.size <= 64).keySet
    val pivots = adj.keys.toSeq
      .sortBy(id => (md5hex(s"btw:$id"), id)).take(8)
    val contrib = scala.collection.mutable
      .Map.empty[Long, (Long, Long)] // node -> (nPivots, bc)
    pivots.foreach { s =>
      val l1 = adj(s).map(v => v -> 1L).toMap
      def expand(prev: Map[Long, Long],
          closer: Set[Long]): Map[Long, Long] = {
        val acc = scala.collection.mutable.Map.empty[Long, Long]
        prev.foreach { case (v, sig) =>
          if (relay(v)) adj(v).foreach { w =>
            if (w != s && !closer(w))
              acc(w) = acc.getOrElse(w, 0L) + sig
          }
        }
        acc.toMap
      }
      val l2 = expand(l1, l1.keySet + s)
      val l3 = expand(l2, l1.keySet ++ l2.keySet + s)
      // backward: per-term floored micro, order-free integer sums
      val d2 = l2.flatMap { case (v, sig) =>
        if (!relay(v)) None
        else {
          val terms = adj(v).toSeq.filter(l3.contains)
            .map(w => (sig * 1000000L) / l3(w))
          if (terms.isEmpty) None else Some(v -> terms.sum)
        }
      }
      val d1 = l1.flatMap { case (v, sig) =>
        if (!relay(v)) None
        else {
          val terms = adj(v).toSeq.filter(l2.contains)
            .map(w => (sig * (1000000L + d2.getOrElse(w, 0L)))
              / l2(w))
          if (terms.isEmpty) None else Some(v -> terms.sum)
        }
      }
      (d1.toSeq ++ d2.toSeq).foreach { case (v, d) =>
        val (n, b) = contrib.getOrElse(v, (0L, 0L))
        contrib(v) = (n + 1, b + d)
      }
    }
    val want = contrib.toSeq.map { case (v, (n, b)) => (v, n, b) }
      .sortBy { case (v, _, b) => (-b, v) }
    val got = Ext85Queries
      .betweennessSampled(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "empty betweenness report")
    assert(got === want)
    // the sample must produce genuine relay structure: some node
    // sits on shortest paths from more than one pivot
    assert(got.exists(_._2 >= 2), "no node served 2+ pivots")
  }

  test("nlist curve: the nCells=16 point agrees with the oracle-gated " +
      "sim_ann_ivf query; recall and cost axes are sane") {
    val rows = Ext85Queries.annNlistCurve(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === Seq(4L, 8L, 16L, 32L))
    // cross-check the 16-cell point against the independent
    // sim_ann_ivf + exact-topk queries the catalog already gates
    val emb = graft.Tables.t(spark, TestSpark.sfDir, "embeddings")
    val exact = Similarity
      .cosineTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
        "embedding", 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf16 = ExtQueries.simAnnIvf(spark, TestSpark.sfDir)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p16 = rows.find(_._1 == 16L).get
    assert(p16._2 === exact.size.toLong)
    assert(p16._3 === (exact & ivf16).size.toLong)
    assert(p16._4 === p16._3 * 1000000L / p16._2)
    rows.foreach { case (_, nExact, hits, recall, nCand) =>
      assert(hits <= nExact)
      assert(recall <= 1000000L)
      assert(nCand >= 0L)
    }
  }

  test("distinct-n: exact gram-set replay per source; " +
      "diversity falls as n grows on repetitive synthetic text") {
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2)))
    def stats(n: Int): Map[String, (Long, Long)] =
      docs.flatMap { case (src, txt) =>
        val toks = txt.trim.split("\\s+").toSeq.map(_.toLowerCase)
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(g => (src, g.mkString(" "))).toSeq
      }.groupBy(_._1).map { case (src, gs) =>
        src -> (gs.map(_._2).distinct.length.toLong,
          gs.length.toLong)
      }
    val s1 = stats(1); val s2 = stats(2); val s3 = stats(3)
    val got = graft.operators.Ext85Queries
      .distinctN(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9)))
    assert(got.nonEmpty)
    got.foreach { case (src, u1, t1, d1, u2, t2, d2, u3, t3, d3) =>
      assert((u1, t1) === s1(src), s"uni($src)")
      assert((u2, t2) === s2(src), s"bi($src)")
      assert((u3, t3) === s3(src), s"tri($src)")
      assert(d1 === u1 * 1000000L / t1)
      assert(d2 === u2 * 1000000L / t2)
      assert(d3 === u3 * 1000000L / t3)
      // longer grams are strictly more distinctive on any corpus
      // with repetition: d1 <= d2 <= d3 (ties possible)
      assert(d1 <= d2 && d2 <= d3, s"monotonicity($src)")
    }
  }

  test("self-bleu: full clip-table replay per source") {
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String, n: Int): Seq[String] = {
      val toks = text.trim.split("\\s+").toSeq.map(_.toLowerCase)
      if (toks.length < n) Seq.empty
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    }
    case class P(num: Long, den: Long)
    def precs(n: Int): Map[(String, Long), P] = {
      val cnt = docs.flatMap { case (id, src, txt) =>
        grams(txt, n).map(g => (src, id, g))
      }.groupBy(identity).map { case ((src, id, g), xs) =>
        (src, id, g, xs.length.toLong) }.toSeq
      val byGram = cnt.groupBy(c => (c._1, c._3))
      cnt.groupBy(c => (c._1, c._2)).map { case ((src, id), rows) =>
        val (num, den) = rows.foldLeft((0L, 0L)) {
          case ((nm, dn), (s, _, g, c)) =>
            val peers = byGram((s, g))
            val m1 = peers.map(_._4).max
            val n1 = peers.count(_._4 == m1)
            val m2 = peers.map(_._4).filter(_ < m1)
              .foldLeft(0L)(math.max)
            val maxother = if (c < m1 || n1 >= 2) m1 else m2
            (nm + math.min(c, maxother), dn + c)
        }
        (src, id) -> P(num, den)
      }
    }
    val p1 = precs(1); val p2 = precs(2)
    val bySrc = p1.keys.toSeq.groupBy(_._1)
    val want = bySrc.toSeq.map { case (src, keys) =>
      val scored = keys.map { k =>
        val a = p1(k)
        val b = p2.getOrElse(k, P(0L, 0L))
        val bleu =
          if (a.num == 0 || b.num == 0 || b.den == 0) 0L
          else math.round(math.exp(0.5
            * (math.log(a.num.toDouble / a.den.toDouble)
              + math.log(b.num.toDouble / b.den.toDouble))) * 1e6)
        (a.num * 1000000L / a.den,
          if (b.den == 0) 0L else b.num * 1000000L / b.den, bleu)
      }
      val n = scored.size.toLong
      (src, n, scored.map(_._1).sum / n, scored.map(_._2).sum / n,
        scored.map(_._3).sum / n)
    }.sortBy(_._1)
    val got = Ext85Queries.selfBleu(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
    // diversity audit is only meaningful if sources differ somewhere
    assert(got.map(_._5).distinct.size > 1
      || got.map(_._3).distinct.size > 1)
  }
}
