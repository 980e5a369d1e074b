package graft

import graft.Tables.t
import graft.operators.Ext49Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the TextRank / pattern-regex / HLL batch. */
class Ext49OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("textrank: integer-lattice replay of the 3 damped iterations " +
    "reproduces the top-30 exactly") {
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pairs = scala.collection.mutable.Map[(String, String), Long]()
    docs.foreach { case (_, text) =>
      val tk = text.trim.split("\\s+").map(_.toLowerCase)
      for (i <- tk.indices; j <- (i + 1) to math.min(i + 2, tk.length - 1)
           if tk(i) != tk(j)) {
        val k = if (tk(i) <= tk(j)) (tk(i), tk(j)) else (tk(j), tk(i))
        pairs(k) = pairs.getOrElse(k, 0L) + 1
      }
    }
    val edges = pairs.filter(_._2 >= 3).toSeq
      .flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val wd = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var sc = wd.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = scala.collection.mutable.Map[String, Long]()
      edges.foreach { case (s, d, n) =>
        in(d) = in.getOrElse(d, 0L) + (sc(s) * n) / wd(s)
      }
      sc = in.map { case (w, v) => w -> (150000L + 85L * v / 100L) }.toMap
    }
    val want = sc.toSeq.sortBy { case (w, v) => (-v, w) }.take(30)
    val got = Ext49Queries.textrankKeywords(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want)
  }

  test("pattern regex: per-user java-regex replay matches the " +
    "histogram, and a planted funnel string counts correctly") {
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), expr("ts div 1000").as("tu"),
        col("event_id"), substring(col("event_type"), 1, 1))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def count(re: String, s: String): Long =
      re.r.findAllMatchIn(s).length.toLong
    val hist = ev.groupBy(_._1).map { case (u, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4).mkString
      (u, count("v[cs]*p", seq), count("ee+", seq))
    }.groupBy(r => (r._2, r._3)).map { case ((f, b), us) =>
      (f, b, us.size.toLong, us.map(_._1).min)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = Ext49Queries.patternRegex(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === hist)
    assert(count("v[cs]*p", "vcspvpee") === 2L)
    assert(count("ee+", "xeexeee") === 2L)
  }

  test("hll: merged registers == register-max across days " +
    "(mergeability), and the merged estimate lands within 15%") {
    val rows = Ext49Queries.hllMerge(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val (allRows, dayRows) = rows.partition(_._1 == -1L)
    assert(allRows.length === 1 && dayRows.nonEmpty)
    assert(rows.forall(_._2 <= 256))
    // replay registers from the raw table
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)"),
        col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def reg(u: Long): (Long, Long) = {
      val h = md5hex(s"hll:$u")
      val idx = java.lang.Long.parseLong(h.substring(0, 2), 16)
      val v = java.lang.Long.parseLong(h.substring(2, 12), 16)
      (idx, if (v == 0) 41L else 41L - (64 - java.lang.Long
        .numberOfLeadingZeros(v)))
    }
    def regsOf(users: Set[Long]): Map[Long, Long] =
      users.map(reg).groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val dayRegs = ev.groupBy(_._1).view
      .mapValues(rs => regsOf(rs.map(_._2).toSet)).toMap
    val mergedFromDays = dayRegs.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val global = regsOf(ev.map(_._2).toSet)
    assert(mergedFromDays === global, "register-max merge != direct build")
    val all = allRows.head
    val sScaled = global.values.map(mr => 1L << (41 - mr)).sum +
      (256 - global.size) * (1L << 41)
    assert(all._4 === sScaled, "s_scaled mismatch")
    // bias-corrected-ish estimate check (float allowed in TEST only)
    val m = 256.0
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / (sScaled.toDouble / math.pow(2, 41))
    val zeros = 256 - global.size
    // the standard HLL small-range correction: linear counting while
    // raw < 2.5m and empty registers remain
    val est = if (raw < 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble)
      else raw
    val exact = all._5.toDouble
    assert(math.abs(est - exact) / exact < 0.15,
      s"HLL estimate $est vs exact $exact")
  }
}
