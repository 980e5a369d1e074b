package graft

import graft.Tables.t
import graft.operators.{Dedup, Ext38Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the curation batch (decontamination, PII scrub,
  * containment dedup).
  */
class Ext38OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("contamination: shares on [0,1e6], eval docs only, and a " +
    "train-only shingle never counts") {
    val rows = Ext38Queries.contamination(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, m) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(c >= 0 && c <= n, s"doc ${r.getLong(0)}: contam > total")
      assert(m === c * 1000000L / n)
    }
    // every reported doc is from an eval source
    val evalDocs = t(spark, TestSpark.sfDir, "documents")
      .filter(expr("cast(substr(source, 4, 10) as int) % 5 = 0"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(evalDocs.contains(r.getLong(0))))
    // cross-check one doc by brute force
    val d = rows.head.getLong(0)
    val evalSh = t(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") === d)
      .select(explode(array_distinct(
        Dedup.shingleArray(col("text"), 5))).as("s"))
      .collect().map(_.getString(0)).toSet
    val trainSh = t(spark, TestSpark.sfDir, "documents")
      .filter(expr("cast(substr(source, 4, 10) as int) % 5 <> 0"))
      .select(explode(array_distinct(
        Dedup.shingleArray(col("text"), 5))).as("s"))
      .collect().map(_.getString(0)).toSet
    assert(rows.head.getLong(1) === evalSh.size)
    assert(rows.head.getLong(2) === evalSh.count(trainSh.contains))
  }

  test("pii scrub: counts match the injection rule and redaction " +
    "shrinks exactly the matched spans") {
    val rows = Ext38Queries.piiScrub(spark, TestSpark.sfDir).collect()
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = docs.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getString(0)
      val ids = bySrc(src).map(_._1)
      assert(r.getLong(1) === ids.length)
      assert(r.getLong(2) === ids.count(_ % 7 == 0), s"$src emails")
      assert(r.getLong(3) === ids.count(_ % 11 == 0), s"$src phones")
      assert(r.getLong(4) === ids.count(_ % 13 == 0), s"$src ips")
      assert(r.getLong(5) > 0 ||
        (r.getLong(2) + r.getLong(3) + r.getLong(4)) === 0)
    }
    // every injected doc is detected somewhere (totals)
    assert(rows.map(_.getLong(2)).sum ===
      docs.count(_._1 % 7 == 0))
  }

  test("containment: catches a doc-in-doc pair Jaccard dilutes, " +
    "bounds hold, and containment >= jaccard") {
    val rows = Ext38Queries.containment(spark, TestSpark.sfDir)
      .collect()
    rows.foreach { r =>
      val (szA, szB, common) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(common <= math.min(szA, szB))
      val (j, c) = (r.getLong(5), r.getLong(6))
      assert(c >= 600000L && c <= 1000000L)
      assert(c >= j, "containment must dominate jaccard")
    }
    // synthetic doc-in-doc check on a tiny frame: 20-shingle doc
    // fully inside a 200-shingle doc -> containment 1e6, J ~ 0.1
    import spark.implicits._
    val big = (0 until 220).map(i => s"w$i").mkString(" ")
    val small = (0 until 22).map(i => s"w$i").mkString(" ")
    val sh = Dedup.shingles(
      Seq((1L, big), (2L, small)).toDF("doc_id", "text"),
      "doc_id", "text")
    val szOf = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val common = sh.filter(col("id") === 1).select(col("shingle"))
      .intersect(sh.filter(col("id") === 2).select(col("shingle")))
      .count()
    val szs = szOf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(common === szs(2L), "small doc fully contained")
    assert(common * 1000000L / math.min(szs(1L), szs(2L)) === 1000000L)
    assert(common * 1000000L / (szs(1L) + szs(2L) - common) < 200000L)
  }
}
