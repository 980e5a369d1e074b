package graft

import graft.operators.Ext78Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext78QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cluster topics: scores replay driver-side for one cluster; " +
      "ranks are 1..3 with descending scores") {
    val rows = Ext78Queries.clusterTopics(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ===
        (1L to sorted.length.toLong))
      val scores = sorted.map(_.getLong(5)).toSeq
      assert(scores === scores.sorted.reverse)
    }
    // driver replay: pick the first reported cluster, recompute its
    // top terms from raw text + the spark-side CC labels
    val labels = graft.operators.Dedup.connectedComponents(
      graft.operators.NearDupGraph.simhashPairs5(spark, TestSpark.sfDir)
        .select("id_a", "id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val texts = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def toks(id: Long): Seq[String] =
      texts(id).trim.split("\\s+").toSeq.map(_.toLowerCase)
    val nDocs = texts.size.toLong
    val df = texts.keys.toSeq.flatMap(id => toks(id).distinct)
      .groupBy(identity).map { case (tk, xs) => tk -> xs.size.toLong }
    val c0 = rows.head.getLong(0)
    val members = labels.filter(_._2 == c0).map(_._1)
    assert(members.nonEmpty)
    val ctf = members.flatMap(toks).groupBy(identity)
      .map { case (tk, xs) => tk -> xs.size.toLong }
    val want = ctf.toSeq.map { case (tk, c) =>
      val score = math.rint(c * math.log(nDocs.toDouble / df(tk)) *
        1e6).toLong
      (tk, c, score)
    }.sortBy { case (tk, _, s) => (-s, tk) }.take(3)
    val got = rows.filter(_.getLong(0) == c0).sortBy(_.getLong(1))
      .map(r => (r.getString(2), r.getLong(3), r.getLong(5))).toSeq
    assert(got === want)
  }

  test("rank correlation: rho replays driver-side and correlated " +
      "scorers read high") {
    val row = Ext78Queries.rankCorrelation(spark, TestSpark.sfDir)
      .head()
    val d = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("n_chars"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("s2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = d.length.toLong
    def ranks(key: ((Long, Long, Long)) => Long): Map[Long, Long] =
      d.sortBy(x => (-key(x), x._1)).zipWithIndex
        .map { case (x, i) => x._1 -> (i + 1L) }.toMap
    val (r1, r2) = (ranks(_._2), ranks(_._3))
    val sumD2 = d.map(x => {
      val diff = r1(x._1) - r2(x._1); diff * diff
    }).sum
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === sumD2)
    val rho = 1.0 - 6.0 * sumD2.toDouble / (n.toDouble *
      (n.toDouble * n.toDouble - 1.0))
    val rhoR6 = java.math.BigDecimal.valueOf(rho)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(row.getDouble(2) === rhoR6)
    // length and token count are strongly monotone on real text
    assert(row.getDouble(2) > 0.5,
      s"length-vs-tokens rho ${row.getDouble(2)} suspiciously low")
  }
}
