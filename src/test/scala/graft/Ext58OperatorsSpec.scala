package graft

import graft.Tables.t
import graft.operators.{Ext58Queries, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the graph-greedy ANN / variance-ratio batch. */
class Ext58OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graph greedy: exact beam replay over the SRP knn graph, " +
    "found_sim never exceeds exact_sim, entry reachability") {
    val emb = t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val vecs = emb.toMap
    def srp(v: Array[Double]): String =
      (0 until 6).map { p =>
        val c = v.indices.map { i =>
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$p,$i".getBytes("UTF-8"))
          val s = if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
          v(i) * s
        }.sum
        if (c >= 0) "1" else "0"
      }.mkString
    def sim(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val buckets = emb.toSeq.map { case (id, v) => (id, srp(v)) }
    val edges = buckets.groupBy(_._2).values.toSeq.flatMap { grp =>
      grp.flatMap { case (a, _) =>
        grp.filter(_._1 != a)
          .map { case (b, _) => (a, b, sim(vecs(a), vecs(b))) }
          .sortBy { case (_, b, s) => (-s, b) }.take(4)
          .map { case (_, b, _) => (a, b) }
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val qs = emb.map(_._1).filter(id => id >= 200 && id < 208)
    val entry = emb.map(_._1).min
    val want = qs.sorted.map { qid =>
      val qv = vecs(qid)
      def top(cands: Set[Long], k: Int): Seq[(Long, Double)] =
        cands.filter(_ != qid).toSeq
          .map(c => (c, sim(qv, vecs(c))))
          .sortBy { case (c, s) => (-s, c) }.take(k)
      var beam = top(Set(entry), 4)
      for (_ <- 1 to 3) {
        val exp = beam.map(_._1).toSet ++
          beam.flatMap(b => edges.getOrElse(b._1, Nil))
        beam = top(exp, 4)
      }
      val fnd = beam.head
      val ex = top(vecs.keySet, 1).head
      (qid, fnd._1, fnd._2, ex._1, ex._2,
        if (fnd._1 == ex._1) 1L else 0L)
    }
    val got = Ext58Queries.graphGreedy(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
    assert(got.toSeq === want)
    got.foreach(r => assert(r._3 <= r._5 + 1e-9,
      "greedy can never beat the exact answer"))
    assert(got.nonEmpty)
  }

  test("variance ratio: integer-moment replay with the zero guard") {
    def floorDiv(a: Long, b: Long): Long =
      (a - (((a % b) + b) % b)) / b
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(rs => floorDiv(rs.map(_._3).sum, rs.length)).toMap
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val want = types.flatMap { et =>
      val m = daily.collect { case ((t, d), v) if t == et => (d, v) }
        .toMap
      def dk(k: Int) = m.keys.filter(d => m.contains(d - k)).toSeq
        .map(d => m(d) - m(d - k))
      def sv(ds: Seq[Long]) = {
        val n = ds.length.toLong
        (n, floorDiv(n * ds.map(d => d * d).sum
          - ds.sum * ds.sum, n * n))
      }
      val (n1, v1) = sv(dk(1)); val (n2, v2) = sv(dk(2))
      if (n1 > 0 && n2 > 0)
        Some((et, n1, v1, n2, v2,
          if (v1 > 0) floorDiv(v2 * 1000000L, 2 * v1) else 0L))
      else None
    }
    val got = Ext58Queries.varianceRatio(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }
}
