package graft

import graft.operators.{Ext9Queries, KeyedMerge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 2: properties the DuckDB hash-compare cannot see —
  * the integer-lattice PCA iterate actually approximates the true
  * (double-precision) top eigenvector, the BPE pair counts agree with
  * a driver-side recount, and the IVM output equals a full recompute
  * of the joined view inside Spark (not just vs the oracle).
  */
class Ext9OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pca power: lattice iterate captures >= 85% of the top " +
      "eigenvalue's variance (Rayleigh quotient vs double-precision)") {
    // the synthetic embedding spectrum is nearly flat (lambda2/lambda1
    // ~ 0.93 at sf0.001), so no fixed iteration count pins the
    // DIRECTION — the convergence statement that is well-posed is the
    // Rayleigh quotient: the iterate's captured variance approaches
    // the max eigenvalue regardless of eigen-gap
    val vMicro = Ext9Queries.pcaPower(spark, TestSpark.sfDir)
      .orderBy("dim").collect().map(_.getLong(1).toDouble)
    assert(vMicro.length === 64)
    val rows = spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x * 1e6).toDouble).toArray)
    val n = rows.length.toDouble
    val d = 64
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum
    }
    def rayleigh(v: Array[Double]): Double = {
      val cv = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * v(j)).sum)
      v.zip(cv).map { case (a, b) => a * b }.sum /
        v.map(x => x * x).sum
    }
    // lambda_max estimate: 200 double-precision power steps
    var ref = Array.fill(d)(1.0)
    for (_ <- 1 to 200) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cov(i)(j) * ref(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      ref = w.map(_ / nrm)
    }
    val ratio = rayleigh(vMicro) / rayleigh(ref)
    assert(ratio > 0.85, s"lattice iterate underconverged: $ratio")
  }

  test("pca power: deterministic under repartitioning") {
    val a = Ext9Queries.pcaPower(spark, TestSpark.sfDir)
      .orderBy("dim").collect().toSeq
    // drop the memoized fit so the second call re-runs the whole
    // distributed aggregation — without this the test only asserts
    // the memo returns the same array twice
    Ext9Queries.clearFitCache()
    val b = Ext9Queries.pcaPower(spark, TestSpark.sfDir)
      .orderBy("dim").collect().toSeq
    assert(a === b)
  }

  test("bpe first merge: top pair agrees with a driver-side recount") {
    val got = Ext9Queries.bpeFirstMerge(spark, TestSpark.sfDir)
      .orderBy("merge_rank").collect()
    assert(got.length === 20)
    // driver recount over the raw text
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("text").collect().foreach { r =>
        r.getString(0).toLowerCase.split("[^a-z]+")
          .filter(_.length >= 2).foreach { w =>
            w.sliding(2).foreach(p =>
              counts(p) = counts.getOrElse(p, 0L) + 1L)
          }
      }
    val expTop = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    got.zip(expTop).foreach { case (r, (pair, cnt)) =>
      assert(r.getString(0) === pair && r.getLong(1) === cnt,
        s"rank ${r.getInt(2)}: got (${r.getString(0)},${r.getLong(1)})" +
          s" want ($pair,$cnt)")
    }
  }

  test("ivm join equals full recompute of the joined view") {
    val dir = TestSpark.sfDir
    val ivm = Ext9Queries.ivmJoin(spark, dir)
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 1000).cast("long").as("value_milli"))
    val a = ev.filter(col("event_id") % 2 === 0)
      .select(col("user_id"), col("event_id").as("a_seq"),
        col("value_milli").as("a_val"))
    val b = ev.filter(col("event_id") % 2 === 1)
      .select(col("user_id"), col("event_id").as("b_seq"),
        col("event_type").as("b_type"))
    val full = KeyedMerge.lww(a, Seq("user_id"), "a_seq")
      .join(KeyedMerge.lww(b, Seq("user_id"), "b_seq"), Seq("user_id"))
      .select("user_id", "a_val", "a_seq", "b_type", "b_seq")
    assert(ivm.orderBy("user_id").collect().toSeq ===
      full.orderBy("user_id").collect().toSeq)
  }

  test("ivm agg equals full recompute and the delta actually " +
      "exercises retraction (erase of a live key + a state change)") {
    val dir = TestSpark.sfDir
    val ivm = Ext9Queries.ivmAgg(spark, dir).collect()
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 1000).cast("long").as("vm"),
        (col("event_id") % 7 === 0).as("del"))
    val full = KeyedMerge.lww(ev, Seq("user_id"), "event_id")
      .filter(!col("del"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"), sum(col("vm")).as("sum_milli"))
      .orderBy("event_type").collect()
    assert(ivm.toSeq === full.toSeq)
    // the delta must change per-key state vs base-only LWW for at
    // least one key (otherwise the retract/add legs are vacuous); the
    // live->erased flip is asserted at sf0.01 — the correctness-gate
    // SF — because the 15-user sf0.001 slice happens to contain no
    // user whose final event is a delta-batch erase (expected count
    // ~15/35 < 1; at sf0.01 there are 4)
    def lastOf(dir0: String, baseOnly: Boolean) = {
      val e = spark.read.parquet(s"$dir0/events.parquet")
        .select(col("event_id"), col("user_id"),
          (col("event_id") % 7 === 0).as("del"))
        .filter(if (baseOnly) col("event_id") % 5 =!= 4 else lit(true))
      KeyedMerge.lww(e, Seq("user_id"), "event_id")
        .select(col("user_id"), col("event_id"), col("del")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    }
    val baseLast = lastOf(dir, baseOnly = true)
    val allLast = lastOf(dir, baseOnly = false)
    val changed = allLast.count { case (k, v) => baseLast.get(k) != Some(v) }
    assert(changed > 0, "delta batch never changes any key's state")
    val gateDir = "/root/testdata/sf0.01"
    val baseG = lastOf(gateDir, baseOnly = true)
    val allG = lastOf(gateDir, baseOnly = false)
    val flipped = allG.count { case (k, (_, d)) =>
      d && baseG.get(k).exists(!_._2)
    }
    assert(flipped > 0,
      "no live key is erased by the delta at the gate SF")
  }

  test("ivm hist equals full recompute; bins conserve the live count " +
      "and value mass") {
    val dir = TestSpark.sfDir
    val ivm = Ext9Queries.ivmHist(spark, dir).collect()
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 1000).cast("long").as("vm"),
        (col("event_id") % 7 === 0).as("del"))
    val liveRows = KeyedMerge.lww(ev, Seq("user_id"), "event_id")
      .filter(!col("del"))
    val full = liveRows
      .withColumn("bin", least(expr("vm div 5200"), lit(31L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"), sum(col("vm")).as("sum_milli"))
      .orderBy("bin").collect()
    assert(ivm.toSeq === full.toSeq)
    // conservation: the maintained bins account for exactly the live
    // state, so any percentile read off them is consistent
    val (liveN, liveSum) = liveRows.agg(count(lit(1)), sum("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(ivm.map(_.getLong(1)).sum === liveN)
    assert(ivm.map(_.getLong(2)).sum === liveSum)
    assert(ivm.length > 1, "fixture collapses into a single bin")
  }
}
