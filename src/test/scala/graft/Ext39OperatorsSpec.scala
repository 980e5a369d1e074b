package graft

import graft.Tables.t
import graft.operators.{Ext39Queries, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the index-health / calibration / switchback batch. */
class Ext39OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ivf cell skew: sizes sum to corpus, shares sum to ~1e6, " +
    "matches the declared quantizer") {
    val rows = Ext39Queries.ivfCellSkew(spark, TestSpark.sfDir)
      .collect()
    val nCorpus = t(spark, TestSpark.sfDir, "embeddings").count()
    assert(rows.map(_.getLong(1)).sum === nCorpus)
    val shareSum = rows.map(_.getLong(2)).sum
    // integer truncation: sum in (1e6 - nCells, 1e6]
    assert(shareSum > 1000000L - rows.length && shareSum <= 1000000L)
    // same quantizer as sim_ann_ivf / embed_kmeans_clusters
    val want = Similarity.assignClusters(
        t(spark, TestSpark.sfDir, "embeddings"), "vec_id",
        "embedding", nCells = 16, kmeansIters = 2, fitSampleMod = 2)
      .groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(want(r.getLong(0)) === r.getLong(1)))
  }

  test("calibration: bins partition the corpus, rates in [0,1e6], " +
    "mean confidence inside its bin") {
    val rows = Ext39Queries.calibration(spark, TestSpark.sfDir)
      .collect()
    val nDocs = t(spark, TestSpark.sfDir, "documents").count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    rows.foreach { r =>
      val (bin, n, conf, rate, gap) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bin >= 0 && bin <= 9)
      assert(rate >= 0 && rate <= 1000000L)
      assert(gap === math.abs(conf - rate))
      // mean confidence lies in the bin's range (bin 9 absorbs 1e6)
      assert(conf >= bin * 100000L)
      assert(bin === 9 || conf < (bin + 1) * 100000L)
      assert(n > 0)
    }
  }

  test("switchback: both arms present, burn-in excluded from the " +
    "moments, lift consistent with the means") {
    val rows = Ext39Queries.switchback(spark, TestSpark.sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L))
    val nAll = t(spark, TestSpark.sfDir, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === nAll)
    rows.foreach { r =>
      assert(r.getLong(1) > 0, "arm with no post-burn-in events")
      assert(r.getLong(4) === r.getLong(3) * 1000000L / r.getLong(1))
    }
    val lift = rows.head.getLong(5)
    assert(lift === rows(1).getLong(4) - rows(0).getLong(4))
    assert(rows(0).getLong(5) === rows(1).getLong(5))
    // burn-in really bites: exclusions are ~1/6 of each arm's traffic
    rows.foreach { r =>
      val total = r.getLong(1) + r.getLong(2)
      val exclMicro = r.getLong(2) * 1000000L / total
      assert(exclMicro > 100000L && exclMicro < 250000L,
        s"burn-in share $exclMicro implausible for uniform arrivals")
    }
  }
}
