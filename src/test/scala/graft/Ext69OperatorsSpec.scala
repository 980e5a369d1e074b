package graft

import graft.operators.Ext69Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the bottom-k-sample batch. */
class Ext69OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bottom-k sample: fixed size R, and MERGEABLE — bottom-k of " +
    "per-shard bottom-k's equals the global sample (KMV identity)") {
    val got = Ext69Queries.bottomkSample(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === Ext69Queries.SampleR)
    assert(got.map(_._1).toSeq === (1L to Ext69Queries.SampleR))
    // hashes strictly increasing (md5 over distinct ids — collisions
    // at 60 bits would be astronomical)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq)
    // merge law: shard by doc_id % 4, take bottom-R per shard, merge,
    // take bottom-R of the union — must equal the global sample
    val all = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        Ext69Queries.mwRank(col("doc_id")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val shardTops = (0 until 4).flatMap { s =>
      all.filter(_._1 % 4 == s).sortBy(p => (p._2, p._1))
        .take(Ext69Queries.SampleR)
    }
    val merged = shardTops.sortBy(p => (p._2, p._1))
      .take(Ext69Queries.SampleR)
    assert(merged.map(_._1) === got.map(_._2).toSeq,
      "per-shard bottom-k merge must reproduce the global sample")
  }
}
