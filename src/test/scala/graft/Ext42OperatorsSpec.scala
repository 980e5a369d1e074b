package graft

import graft.Tables.t
import graft.operators.{Dedup, Ext42Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the LSH-recall / range-window / chunker batch. */
class Ext42OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("lsh recall: found <= true per bucket, recall exact, and " +
    "banding can genuinely miss a mid-J pair") {
    val rows = Ext42Queries.lshRecall(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
    // banding theory on a constructed pair: J ~ 0.15 (3 of 20
    // shingles shared) -> P[band match] = 1-(1-s^4)^4 ~ 0.2%: the
    // 16x4 banding finds it only if one 4-seed band agrees on all
    // four minhashes. Verify the mechanism (not chance): the pair's
    // band signatures differ in every band.
    import spark.implicits._
    val a = (0 until 20).map(i => s"s$i")
    val b = (0 until 3).map(i => s"s$i") ++
      (0 until 17).map(i => s"t$i")
    val sh = (a.map((1L, _)) ++ b.map((2L, _)))
      .toDF("id", "shingle")
    val bs = Dedup.bandSignatures(sh, 16, 4)
    val agree = bs.filter(col("id") === 1).as("x")
      .join(bs.filter(col("id") === 2).as("y"),
        col("x.band") === col("y.band") &&
          col("x.bsig") === col("y.bsig")).count()
    // 3/20 shared: each band (4 seeds) agrees with prob s^4 ~ 5e-4;
    // with 4 bands a hit is ~0.2% likely — assert the overwhelmingly
    // probable outcome that candidates miss this TRUE mid-J pair
    assert(agree === 0, "mid-J pair unexpectedly banded together")
  }

  test("range window: trailing 3600s frame matches brute force per " +
    "user, ties enter together") {
    val rows = Ext42Queries.rangeWindow(spark, TestSpark.sfDir)
      .collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val evs = rs.map(r => (r.getLong(2), r.getLong(3))) // tsec, vm
      rs.foreach { r =>
        val t0 = r.getLong(2)
        val want = evs.filter(e => e._1 >= t0 - 3600 && e._1 <= t0)
        assert(r.getLong(4) === want.map(_._2).sum,
          s"w_sum at tsec $t0")
        assert(r.getLong(5) === want.length)
      }
    }
  }

  test("chunker: full coverage with exact overlap, fingerprints " +
    "match recomputed slices") {
    val rows = Ext42Queries.chunkOverlap(spark, TestSpark.sfDir)
      .collect()
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("tk"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rs) =>
      val tk = docs(d)
      val sorted = rs.sortBy(_.getLong(1))
      // chunks tile the doc: first starts at 1, steps of 96, last
      // chunk reaches the final token
      assert(sorted.head.getLong(2) === 1L)
      sorted.sliding(2).filter(_.length == 2).foreach { p =>
        assert(p(1).getLong(2) - p(0).getLong(2) === 24L)
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 === tk.length,
        s"doc $d not fully covered")
      // every chunk is nonempty and <= 32; all but last are 32 or
      // the doc is shorter than one chunk
      sorted.foreach(r =>
        assert(r.getLong(3) >= 1 && r.getLong(3) <= 32))
      // fingerprint replay on the first chunk
      val c0 = sorted.head
      val slice0 = tk.slice(0, c0.getLong(3).toInt).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(slice0.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(c0.getString(4) === md)
    }
    // overlap arithmetic: consecutive 32-token chunks share 8
    val multi = byDoc.filter(_._2.length > 1)
    assert(multi.nonEmpty, "fixture has no multi-chunk docs")
  }
}
