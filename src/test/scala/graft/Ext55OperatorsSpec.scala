package graft

import graft.Tables.t
import graft.operators.{Ext55Queries, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the text/binary source + explode_outer batch. */
class Ext55OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("text source: line roundtrip preserves count, bytes, and the " +
    "order-independent fingerprint") {
    val row = Ext55Queries.textRoundtrip(spark, TestSpark.sfDir)
      .collect().head
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    assert(row.getLong(0) === docs.length.toLong)
    assert(row.getLong(1) === docs.map(_.getBytes("UTF-8").length.toLong).sum)
    val xor = docs.map(tx =>
      java.lang.Long.parseLong(md5hex(tx).substring(0, 15), 16))
      .reduce(_ ^ _)
    assert(row.getLong(2) === xor)
  }

  test("binaryFile source: whole-file bytes survive, ids parsed from " +
    "file names, one row per asset") {
    val got = Ext55Queries.binaryFileScan(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = t(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") < 64).select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")
        .length.toLong, md5hex(r.getString(1))))
      .sortBy(_._1)
    assert(got.toSeq === want.toSeq)
    assert(got.nonEmpty)
  }

  test("explode_outer: empty-match docs survive as null rows that an " +
    "inner explode would silently drop") {
    val row = Ext55Queries.explodeOuter(spark, TestSpark.sfDir)
      .collect().head
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        filter(TextAnalysis.tokens(col("text")),
          tk => lower(tk).startsWith("z")).as("zs"))
    val nDocs = docs.count()
    val inner = docs.select(col("doc_id"), explode(col("zs")).as("z"))
    val innerDocs = inner.select("doc_id").distinct().count()
    assert(row.getLong(1) === nDocs, "outer explode keeps every doc")
    assert(row.getLong(2) === nDocs - innerDocs,
      "null rows are exactly the docs the inner explode drops")
    assert(row.getLong(3) === inner.count(), "match rows agree")
    assert(row.getLong(0) === row.getLong(2) + row.getLong(3))
    assert(row.getLong(2) > 0, "fixture must have unmatched docs")
  }
}
