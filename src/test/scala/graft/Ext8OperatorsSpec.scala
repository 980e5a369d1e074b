package graft

import graft.operators.Ext8Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation batch: priority sampling + compaction planning.
  * Invariants that the DuckDB hash-compare cannot see: determinism
  * under repartitioning, estimator bounds, conservation laws.
  */
class Ext8OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("weighted sample: exactly K ranks 1..K per language, " +
      "deterministic under repartitioning") {
    val df = Ext8Queries.weightedSample(spark, TestSpark.sfDir)
    val perLang = df.groupBy("lang")
      .agg(count(lit(1)).as("n"), min("smp_rank").as("lo"),
        max("smp_rank").as("hi"), countDistinct("smp_rank").as("d"))
      .collect()
    assert(perLang.nonEmpty)
    perLang.foreach { r =>
      assert(r.getLong(1) === 24L, r)
      assert(r.getInt(2) === 1 && r.getInt(3) === 24, r)
      assert(r.getLong(4) === 24L, r)
    }
    // same rows regardless of input partitioning (no rand() anywhere)
    val again = Ext8Queries.weightedSample(spark, TestSpark.sfDir)
      .repartition(13).orderBy("lang", "smp_rank").collect()
    assert(df.orderBy("lang", "smp_rank").collect().toSeq ===
      again.toSeq)
  }

  test("weighted sample: Horvitz–Thompson weight >= raw weight and " +
      ">= the stratum threshold for every sampled row") {
    val rows = Ext8Queries.weightedSample(spark, TestSpark.sfDir)
      .select("lang", "weight", "est_w").collect()
    rows.foreach { r =>
      assert(r.getDouble(2) >= r.getLong(1).toDouble, r)
    }
    // every stratum here has > K members, so tau exists: rows whose
    // weight is below tau all share est_w = tau (one distinct value
    // per stratum), and at least one such tau-dominated row exists
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val tauRows = rs.filter(r => r.getDouble(2) > r.getLong(1))
      assert(tauRows.nonEmpty, s"$lang: no tau-dominated row")
      assert(tauRows.map(_.getDouble(2)).distinct.length === 1,
        s"$lang: tau-dominated rows disagree on tau")
    }
  }

  test("weighted sample favors heavy documents: sampled mean weight " +
      "exceeds corpus mean weight") {
    val docs = graft.Tables.t(spark, TestSpark.sfDir, "documents")
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = Ext8Queries.weightedSample(spark, TestSpark.sfDir)
      .agg(avg("weight")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("binpack: conserves docs and bytes, file ids contiguous from " +
      "0, every file but the last per lang reaches the target") {
    val docs = graft.Tables.t(spark, TestSpark.sfDir, "documents")
    val total = docs.agg(count(lit(1)), sum("n_chars")).head()
    val plan = Ext8Queries.binpack(spark, TestSpark.sfDir)
    val agg = plan.agg(sum("n_docs"), sum("file_chars")).head()
    assert(agg.getLong(0) === total.getLong(0))
    assert(agg.getLong(1) === total.getLong(1))

    val perLang = plan.orderBy("lang", "file_id").collect()
      .groupBy(_.getString(0))
    perLang.foreach { case (lang, files) =>
      val ids = files.map(_.getLong(1)).toSeq
      assert(ids === (0L until ids.length).toSeq,
        s"$lang file ids not contiguous: $ids")
      // next-fit invariant: a file only closes once filled, so all but
      // the last file hold >= target chars minus the straddling doc —
      // equivalently cum chars at each non-final boundary >= target
      val cum = files.map(_.getLong(3)).scanLeft(0L)(_ + _).drop(1)
      cum.dropRight(1).zipWithIndex.foreach { case (c, i) =>
        assert(c >= 4096L * (i + 1), s"$lang file $i underfilled: $c")
      }
    }
  }

  test("binpack plan: one window + one aggregate, no join, no " +
      "driver-side step") {
    val p = Ext8Queries.binpack(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length === 1, p)
  }
}
