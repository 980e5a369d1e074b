package graft

import graft.operators.{Ext81Queries, Similarity}
import org.scalatest.funsuite.AnyFunSuite

class Ext81QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("multiprobe recall audit: one query's three top-5 sets replay " +
      "driver-side; recalls are well-formed") {
    val rows = Ext81Queries.multiprobeRecall(spark, TestSpark.sfDir)
      .collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(r.getLong(1) === 5L) // exact top-5 always fills
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 5)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 5)
      assert(r.getLong(4) === r.getLong(2) * 1000000L / 5)
      assert(r.getLong(5) === r.getLong(3) * 1000000L / 5)
    }
    // driver replay for query 0: sequential-fold sims (the FloatVecDot
    // order), HALF_UP round-6, md5 hyperplane buckets
    val emb = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def bucket(v: Array[Float]): String =
      (0 until 8).map { p =>
        var acc = 0.0; var j = 0
        while (j < v.length) {
          acc += v(j).toDouble * Similarity.planeComponent(p, j); j += 1
        }
        if (acc >= 0) '1' else '0'
      }.mkString
    val byId = emb.toMap
    val q0 = 0L
    val qv = byId(q0)
    val qn = math.sqrt(dot(qv, qv))
    def sim(n: Long): Double = {
      val nv = byId(n)
      r6(dot(qv, nv) / (qn * math.sqrt(dot(nv, nv))))
    }
    def top5(cands: Seq[Long]): Set[Long] =
      cands.map(n => (sim(n), n)).sortBy { case (s, n) => (-s, n) }
        .take(5).map(_._2).toSet
    val all = emb.map(_._1).filter(_ != q0)
    val buckets = emb.map { case (id, v) => id -> bucket(v) }.toMap
    val qb = buckets(q0)
    val probes = (qb +: (0 until 8).map(i =>
      qb.updated(i, if (qb(i) == '1') '0' else '1')).toSeq).toSet
    val exact = top5(all.toSeq)
    val singleSet = top5(all.filter(n => buckets(n) == qb).toSeq)
    val multiSet = top5(all.filter(n => probes(buckets(n))).toSeq)
    val r0 = rows.find(_.getLong(0) == q0).get
    assert(r0.getLong(2) === exact.intersect(singleSet).size.toLong)
    assert(r0.getLong(3) === exact.intersect(multiSet).size.toLong)
  }
}
