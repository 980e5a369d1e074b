package graft

import graft.operators.Ext5Queries
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 batch: sequence packing, paragraph dedup, integer PageRank,
  * mix allocation — invariant checks beyond the DuckDB hash gate.
  */
class Ext5OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("paragraph dedup: kept counts bounded, distinct paras conserved") {
    val rows = Ext5Queries.paragraphDedup(spark, TestSpark.sfDir).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_paras"))
      assert(r.getAs[Long]("n_kept") >= 0)
    }
    // every distinct paragraph survives exactly once globally:
    // total kept == global distinct paragraph count
    import org.apache.spark.sql.functions._
    val docs = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("tk"))
    val nDistinct = docs
      .select(explode(sequence(lit(0),
        ceil(size(col("tk")) / lit(10.0)).cast("int") - 1)).as("i"),
        col("tk"))
      .select(md5(concat_ws(" ",
        slice(col("tk"), col("i") * 10 + 1, lit(10)))).as("h"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_kept")).sum === nDistinct)
  }

  test("pagerank: ranks positive, deterministic, mass bounded by scale") {
    val a = Ext5Queries.pageRank(spark, TestSpark.sfDir).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("rank_micro") > 0)
      assert(r.getAs[Long]("deg") > 0)
    }
    // integer truncation only loses mass: total <= 1e6 (+N rounding)
    val total = a.map(_.getAs[Long]("rank_micro")).sum
    assert(total <= 1000000L + a.length)
    val b = Ext5Queries.pageRank(spark, TestSpark.sfDir).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(3))).toSeq ===
      b.map(r => (r.getLong(0), r.getLong(3))).toSeq)
  }

  test("mix allocation: allocs sum exactly to the budget, monotone in w") {
    val rows = Ext5Queries.mixAllocation(spark, TestSpark.sfDir).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === 300L)
    // largest-remainder keeps allocation within 1 of the exact share
    val sumW = rows.map(_.getAs[Long]("w")).sum
    rows.foreach { r =>
      val exact = 300.0 * r.getAs[Long]("w") / sumW
      val alloc = r.getAs[Long]("alloc")
      assert(math.abs(alloc - exact) <= 1.0 + 1e-9)
    }
  }
}
