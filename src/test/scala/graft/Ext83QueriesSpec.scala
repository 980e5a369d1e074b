package graft

import graft.operators.Ext83Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext83QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("count-sketch: driver replay of buckets, signs, cells and the " +
      "median-of-rows estimate") {
    val keys = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select("l_suppkey").collect().map(_.getLong(0))
    def bucket(r: Int, k: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$r:$k").take(4), 16) % 64
    def sign(r: Int, k: Long): Long =
      if ("02468ace".contains(md5hex(s"s:$r:$k").charAt(0))) 1L
      else -1L
    val cells = (for { r <- 0 until 3; k <- keys }
      yield ((r, bucket(r, k)), sign(r, k)))
      .groupBy(_._1).map { case (rb, xs) => rb -> xs.map(_._2).sum }
    val exact = keys.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    def est(k: Long): Long = {
      val es = (0 until 3)
        .map(r => sign(r, k) * cells((r, bucket(r, k)))).sorted
      es(1) // median of 3
    }
    val want = exact.toSeq.sortBy { case (k, f) => (-f, k) }.take(10)
    val got = Ext83Queries.countSketch(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((k, f, e, err), (wk, wf)) =>
      assert(k === wk)
      assert(f === wf)
      assert(e === est(k), s"estimate for supplier $k")
      assert(err === e - f)
    }
  }

  test("spectral peak: driver replay of the quantized trig table and " +
      "the integer spectral sums") {
    val hourly = Tables.t(spark, TestSpark.sfDir, "events")
      .select(expr("ts div 3600000000000").as("hr"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("hr").agg(sum("vm").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Ext83Queries.spectralPeak(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._1).toSeq === Seq(6L, 12L, 24L, 168L))
    got.foreach { case (period, nH, cSum, sSum, amp) =>
      assert(nH === hourly.length.toLong)
      def q(f: Double => Double, hr: Long): Long =
        math.round(f(2 * math.Pi * (hr % period) / period) * 1e6)
      val wc = hourly.map { case (hr, v) => v * q(math.cos, hr) }.sum
      val ws = hourly.map { case (hr, v) => v * q(math.sin, hr) }.sum
      assert(cSum === wc, s"c_sum at period $period")
      assert(sSum === ws, s"s_sum at period $period")
      assert(amp === math.round(math.sqrt(
        cSum.toDouble * cSum + sSum.toDouble * sSum) / 1e6))
      assert(amp >= 0)
    }
  }

  test("correlated dimension pairs: driver replay of the exact " +
      "moments and the top-20 |r| ranking") {
    val vecs = Tables.t(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray
        .map(x => math.round(x.toDouble * 1000)))
    val d = vecs.head.length
    val n = vecs.length.toLong
    val s1 = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val s2 = Array.tabulate(d)(i => vecs.map(v => v(i) * v(i)).sum)
    def corr(i: Int, j: Int): (Long, Long) = {
      val sxy = vecs.map(v => v(i) * v(j)).sum
      val num = n.toDouble * sxy - s1(i).toDouble * s1(j)
      val den = math.sqrt(
        (n.toDouble * s2(i) - s1(i).toDouble * s1(i)) *
          (n.toDouble * s2(j) - s1(j).toDouble * s1(j)))
      (sxy, math.round(num / den * 1e6))
    }
    val all = for (i <- 0 until d; j <- i + 1 until d) yield {
      val (sxy, c) = corr(i, j)
      (i + 1L, j + 1L, sxy, c)
    }
    val want = all.sortBy(t => (-math.abs(t._4), t._1, t._2)).take(20)
    val got = Ext83Queries.corrPairs(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === want)
  }
}
