package graft

import graft.Tables.t
import graft.operators.Ext59Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the diverse-subset / sampled-count batch. */
class Ext59OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("diverse subset: farthest-first replay, picks strictly spread " +
    "(each pick's best-sim below or at the previous cover level)") {
    val emb = t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    def simMicro(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.round(dot / (na * nb) * 1000000)
    }
    var centers = Seq(emb.keys.min)
    val want = scala.collection.mutable.Buffer(
      (0L, centers.head, 1000000L))
    def bestSim(): Map[Long, Long] = emb.keys.filterNot(centers.contains)
      .map(v => v -> centers.map(c => simMicro(emb(v), emb(c))).max)
      .toMap
    for (k <- 1 to 3) {
      val bs = bestSim()
      val pick = bs.toSeq.minBy { case (v, s) => (s, v) }
      want += ((k.toLong, pick._1, pick._2))
      centers = centers :+ pick._1
    }
    val cover = bestSim().toSeq.minBy { case (v, s) => (s, v) }
    want += ((9L, cover._1, cover._2))
    val got = Ext59Queries.diverseSubset(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    // monotonicity: each later pick is no farther out than the one
    // before it (farthest-first property)
    val sims = got.filter(r => r._1 >= 1 && r._1 <= 3).map(_._3)
    assert(sims.sliding(2).forall(p => p(1) >= p(0)),
      "min-max similarity must be non-decreasing over picks")
  }

  test("sampled token count: estimator replay and exact ride-along") {
    val row = Ext59Queries.tokCountSampled(spark, TestSpark.sfDir)
      .collect().head
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+").length.toLong))
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"tc:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 2), 16) % 16
    }
    val exact = docs.map(_._2).sum
    val samp = docs.filter(d => bucket(d._1) == 0)
    assert(row.getLong(0) === docs.length.toLong)
    assert(row.getLong(1) === exact)
    assert(row.getLong(2) === samp.length.toLong)
    assert(row.getLong(3) === samp.map(_._2).sum * 16)
    val d = (samp.map(_._2).sum * 16 - exact) * 1000000L
    assert(row.getLong(4) === Math.floorDiv(d, exact))
    // 1/16 hash sampling at fixture scale stays within 60% —
    // the point is determinism + the err column, not tightness here
    assert(math.abs(row.getLong(4)) < 600000L)
  }
}
