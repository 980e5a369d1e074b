package graft

import graft.Tables.t
import graft.operators.{Ext61Queries, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the HITS / RAKE batch. */
class Ext61OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hits: two-iteration walk-count replay on the distinct " +
    "supplier-part edges") {
    val edges = t(spark, TestSpark.sfDir, "lineitem")
      .select("l_suppkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h1 = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val a1 = edges.groupBy(_._2).view
      .mapValues(_.map(e => h1(e._1)).sum).toMap
    val h2 = edges.groupBy(_._1).view
      .mapValues(_.map(e => a1(e._2)).sum).toMap
    val want = (
      h2.toSeq.sortBy { case (s, h) => (-h, s) }.take(20)
        .map { case (s, h) => ("hub", s, h) } ++
      a1.toSeq.sortBy { case (p, a) => (-a, p) }.take(20)
        .map { case (p, a) => ("auth", p, a) }
    ).sortBy(r => (r._1, r._2))
    val got = Ext61Queries.hits2(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    assert(got.count(_._1 == "hub") === math.min(20, h2.size))
  }

  test("rake: phrase-run replay — stopword-delimited islands, " +
    "deg/freq word scores, summed phrase scores") {
    val stop = TextAnalysis.enStopwords.toSet
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrase occurrences per doc
    val occs = docs.flatMap { case (did, text) =>
      val toks = text.trim.split("\\s+").map(_.toLowerCase)
      val runs = scala.collection.mutable.Buffer[Vector[String]]()
      var cur = Vector.empty[String]
      toks.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) runs += cur; cur = Vector() }
        else cur = cur :+ w
      }
      if (cur.nonEmpty) runs += cur
      runs.map(r => (did, r))
    }
    val freq = occs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val deg = occs.flatMap { case (_, r) => r.map(w => (w, r.length.toLong)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wscore = freq.keys.map(w => w -> deg(w) * 1000000L / freq(w))
      .toMap
    val want = occs.filter(_._2.length >= 2)
      .map { case (_, r) => (r.mkString(" "), r.map(wscore).sum) }
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.head._2)).toMap
      .toSeq.map { case (p, (n, s)) => (p, n, s) }
      .sortBy { case (p, _, s) => (-s, p) }.take(30)
    val got = Ext61Queries.rakePhrases(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }
}
