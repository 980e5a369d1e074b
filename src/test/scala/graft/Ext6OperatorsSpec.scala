package graft

import graft.operators.Ext6Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval + layout batch: inverted index, BM25, count-min sketch,
  * z-order locality — semantic properties beyond the DuckDB hash gate.
  */
class Ext6OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("inverted index: df and tf are consistent with a direct count") {
    val idx = Ext6Queries.invertedIndex(spark, TestSpark.sfDir)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df"), r.getAs[Long]("tf_total"))).toMap
    assert(idx.nonEmpty)
    val direct = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text")))
          .as("term"))
      .filter(col("term") === "spark")
      .agg(countDistinct(col("doc_id")), count(lit(1)))
      .head
    assert(idx("spark") === ((direct.getLong(0), direct.getLong(1))))
    idx.values.foreach { case (df, tf) => assert(tf >= df && df >= 5) }
  }

  test("bm25: every returned doc contains a query term, ranks dense") {
    val rows = Ext6Queries.bm25TopK(spark, TestSpark.sfDir).collect()
    assert(rows.length === 20)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 20))
    // scores non-increasing
    val scores = rows.map(_.getAs[Long]("score_e4"))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ => ()
    }
    rows.foreach(r => assert(r.getAs[Long]("n_terms_hit") >= 1))
  }

  test("cms sketch: min-over-rows estimate upper-bounds and tracks exact counts") {
    val cells = Ext6Queries.cmsSketch(spark, TestSpark.sfDir).collect()
      .map(r => (r.getAs[Int]("sketch_row"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    val exact = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("l_suppkey") ->
        r.getAs[Long]("n")).toMap
    // total mass per sketch row equals the row count
    val total = exact.values.sum
    (0 until 4).foreach { r =>
      assert(cells.collect { case ((`r`, _), c) => c }.sum === total)
    }
    def bucketOf(r: Int, k: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$k".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h, 16) % 64
    }
    exact.foreach { case (k, n) =>
      val est = (0 until 4)
        .map(r => cells.getOrElse((r, bucketOf(r, k)), 0L)).min
      assert(est >= n) // CMS never under-estimates
    }
  }

  test("zorder: buckets are contiguous boxes covering all orders") {
    val rows = Ext6Queries.zorderLayout(spark, TestSpark.sfDir).collect()
    val nOrders = Tables.t(spark, TestSpark.sfDir, "orders").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === nOrders)
    rows.foreach { r =>
      assert(r.getAs[Long]("cust_min") <= r.getAs[Long]("cust_max"))
      assert(r.getAs[Long]("day_min") <= r.getAs[Long]("day_max"))
      // within one z-bucket (z >> 16) the high 8 bits of BOTH dims are
      // fixed, so each dim lies inside one aligned 256-wide block —
      // the tight two-dimensional bounding box that makes z-order
      // layouts prunable on either column
      assert(r.getAs[Long]("cust_max") - r.getAs[Long]("cust_min") <= 255)
      assert(r.getAs[Long]("day_max") - r.getAs[Long]("day_min") <= 255)
    }
  }
}
