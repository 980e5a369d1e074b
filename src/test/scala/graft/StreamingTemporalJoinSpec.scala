package graft

import graft.streaming.StreamingTemporalJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming as-of enrichment against a CHANGING dimension must equal
  * the batch as-of join on finalized rows, and survive a checkpointed
  * kill-and-restart without loss or duplication.
  */
class StreamingTemporalJoinSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  // facts = clicks, dimension versions = the user's view events (the
  // dimension CHANGES as views arrive: each view re-versions the
  // user's value attribute)
  def ev: DataFrame = Tables.t(spark, TestSpark.sfDir, "events")
    .select(col("user_id"), col("event_id"), col("event_type"),
      Tables.eventsTsMicros.as("ts"),
      round(col("value") * 1000).cast("long").as("vm"))

  def facts: DataFrame = ev.filter(col("event_type") === "click")
    .select(col("user_id").as("key"), col("ts").as("ft"),
      col("event_id").as("fact_id"), col("vm").as("fact_vm"))

  def dims: DataFrame = ev.filter(col("event_type") === "view")
    .select(col("user_id").as("key"), col("ts").as("vt"),
      col("vm").as("dim_vm"))

  /** Batch oracle: per fact, the dimension version with max (vt, vm)
    * among vt <= ft — the exact deterministic rule the operator uses.
    */
  def batchAsOf(f: DataFrame, d: DataFrame): DataFrame = {
    // lexicographic max over (vt, dim_vm) among versions at-or-before
    // the fact — the operator's exact pick rule; facts with no version
    // in force keep nulls via the left join back
    val valid = f.join(d, Seq("key")).filter(col("vt") <= col("ft"))
      .groupBy("key", "fact_id")
      .agg(max(struct(col("vt"), col("dim_vm"))).as("pick"))
    f.join(valid, Seq("key", "fact_id"), "left")
      .select(col("key"), col("fact_id"), col("ft"), col("fact_vm"),
        col("pick.vt").as("dim_vt"), col("pick.dim_vm").as("dim_vm"))
  }

  def norm(df: DataFrame, cutoffMs: Long)
      : Set[(Long, Long, Long, Long, Long)] =
    df.filter(unix_millis(col("ft")) < cutoffMs)
      .select(col("key"), col("fact_id"), col("fact_vm"),
        coalesce(unix_millis(col("dim_vt")), lit(-1L)).as("dvt"),
        coalesce(col("dim_vm"), lit(-1L)).as("dvm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  /** Strictly below the final global watermark: min of the two
    * streams' max event times, minus the 30-minute delay, minus 1 s
    * of slack.
    */
  def finalCutoffMs: Long = {
    val maxF = facts.agg(max(unix_millis(col("ft")))).collect()(0)
      .getLong(0)
    val maxD = dims.agg(max(unix_millis(col("vt")))).collect()(0)
      .getLong(0)
    math.min(maxF, maxD) - 1801L * 1000
  }

  test("streaming enrichment == batch as-of on finalized facts, " +
      "with versions changing mid-stream") {
    val fDir = Files.createTempDirectory("tj-f").toString
    val dDir = Files.createTempDirectory("tj-d").toString
    // interleave arrival in TIME-ordered thirds: versions keep
    // arriving while facts flow (the case the operator exists for — a
    // static snapshot would enrich early facts with later versions or
    // miss new ones), and arrival respects the watermark contract the
    // operator is built on: a changelog never delivers rows more than
    // the lateness delay behind the stream's frontier
    def third(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) dayofmonth(c) <= 10
      else if (i == 1) dayofmonth(c) > 10 && dayofmonth(c) <= 20
      else dayofmonth(c) > 20
    (0 until 3).foreach { i =>
      facts.filter(third(col("ft"), i))
        .coalesce(1).write.mode("append").parquet(fDir)
      dims.filter(third(col("vt"), i))
        .coalesce(1).write.mode("append").parquet(dDir)
    }
    val fs = spark.readStream.schema(spark.read.parquet(fDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(fDir)
    val ds = spark.readStream.schema(spark.read.parquet(dDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dDir)
    val q = StreamingTemporalJoin.enrich(fs, ds, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tj_out")
      .option("checkpointLocation",
        Files.createTempDirectory("tj-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)

    // facts newer than (final watermark) are legitimately still held
    // in state at stream end; below the cutoff stream and batch MUST
    // agree row-for-row. The global watermark is the MIN across the
    // two inputs (multipleWatermarkPolicy=min), so the cutoff derives
    // from whichever stream's max event time is older.
    val cutoff = finalCutoffMs
    val got = norm(spark.table("tj_out"), cutoff)
    val want = norm(batchAsOf(facts, dims), cutoff)
    assert(want.exists(_._4 == -1L),
      "fixture must leave some facts with no version in force")
    assert(want.exists(_._4 != -1L),
      "fixture must enrich some facts")
    assert(got === want)
  }

  test("out-of-order delivery WITHIN the lateness window still " +
      "yields the exact batch as-of") {
    val fDir = Files.createTempDirectory("tj3-f").toString
    val dDir = Files.createTempDirectory("tj3-d").toString
    // time-ordered thirds (the watermark contract), but each slice is
    // SHUFFLED internally by md5 — rows arrive out of order inside
    // the lateness window, which is exactly the disorder a real
    // changelog delivers and the operator's buffering must absorb
    def third(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) dayofmonth(c) <= 10
      else if (i == 1) dayofmonth(c) > 10 && dayofmonth(c) <= 20
      else dayofmonth(c) > 20
    (0 until 3).foreach { i =>
      facts.filter(third(col("ft"), i))
        .orderBy(md5(concat_ws(":", col("fact_id"), col("key"))))
        .coalesce(1).write.mode("append").parquet(fDir)
      dims.filter(third(col("vt"), i))
        .orderBy(md5(concat_ws(":", col("vt"), col("key"))))
        .coalesce(1).write.mode("append").parquet(dDir)
    }
    val fs = spark.readStream.schema(spark.read.parquet(fDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(fDir)
    val ds = spark.readStream.schema(spark.read.parquet(dDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dDir)
    val q = StreamingTemporalJoin.enrich(fs, ds, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tj3_out")
      .option("checkpointLocation",
        Files.createTempDirectory("tj3-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val cutoff = finalCutoffMs
    val got = norm(spark.table("tj3_out"), cutoff)
    val want = norm(batchAsOf(facts, dims), cutoff)
    assert(got === want,
      "in-window disorder must not change the finalized enrichments")
  }

  test("facts beyond the lateness window are dead-lettered: dropped " +
      "from output and surfaced in lateDrops") {
    val fDir = Files.createTempDirectory("tj4-f").toString
    val dDir = Files.createTempDirectory("tj4-d").toString
    def third(c: org.apache.spark.sql.Column, i: Int) =
      if (i == 0) dayofmonth(c) <= 10
      else if (i == 1) dayofmonth(c) > 10 && dayofmonth(c) <= 20
      else dayofmonth(c) > 20
    (0 until 3).foreach { i =>
      facts.filter(third(col("ft"), i))
        .coalesce(1).write.mode("append").parquet(fDir)
      dims.filter(third(col("vt"), i))
        .coalesce(1).write.mode("append").parquet(dDir)
    }
    // phase 4: clones of the EARLIEST facts redelivered after the
    // watermark moved a month past them — beyond any lateness window.
    // Re-keyed fact_ids so presence in the output is detectable.
    val lateClones = facts.orderBy(col("ft")).limit(7)
      .withColumn("fact_id", col("fact_id") + lit(1000000000L))
    val nLate = lateClones.count()
    lateClones.coalesce(1).write.mode("append").parquet(fDir)
    val fs = spark.readStream.schema(spark.read.parquet(fDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(fDir)
    val ds = spark.readStream.schema(spark.read.parquet(dDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dDir)
    val q = StreamingTemporalJoin.enrich(fs, ds, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tj4_out")
      .option("checkpointLocation",
        Files.createTempDirectory("tj4-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    // the finalized output is EXACTLY the on-time batch as-of — the
    // late redeliveries neither appear nor perturb prior enrichments
    val cutoff = finalCutoffMs
    val got = norm(spark.table("tj4_out"), cutoff)
    val want = norm(batchAsOf(facts, dims), cutoff)
    assert(got === want)
    assert(!spark.table("tj4_out").collect()
      .exists(_.getLong(1) >= 1000000000L),
      "a beyond-lateness fact leaked into the enrichment output")
    // ...and each one is accounted as a dead-letter drop
    assert(StreamingTemporalJoin.lateDrops(q) === nLate)
  }

  test("enrichment state survives a checkpointed kill-and-restart " +
      "without loss or duplication") {
    val fDir = Files.createTempDirectory("tj2-f").toString
    val dDir = Files.createTempDirectory("tj2-d").toString
    val ckpt = Files.createTempDirectory("tj2-ckpt").toString
    val out = Files.createTempDirectory("tj2-out").toString
    // phase 1: early half of both streams
    val fHalf = facts.filter(dayofmonth(col("ft")) <= 15)
    val dHalf = dims.filter(dayofmonth(col("vt")) <= 15)
    fHalf.coalesce(2).write.mode("append").parquet(fDir)
    dHalf.coalesce(2).write.mode("append").parquet(dDir)
    def run(): Unit = {
      val fs = spark.readStream.schema(spark.read.parquet(fDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(fDir)
      val ds = spark.readStream.schema(spark.read.parquet(dDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dDir)
      val q = StreamingTemporalJoin.enrich(fs, ds, "30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    run()
    // phase 2: the rest arrives after the restart — versions buffered
    // before the kill must still enrich facts that finalize after it
    facts.filter(dayofmonth(col("ft")) > 15)
      .coalesce(2).write.mode("append").parquet(fDir)
    dims.filter(dayofmonth(col("vt")) > 15)
      .coalesce(2).write.mode("append").parquet(dDir)
    run()
    val all = spark.read.parquet(out)
    // no fact may be emitted twice across the restart
    val dups = all.groupBy("key", "fact_id").count()
      .filter(col("count") > 1)
    assert(dups.isEmpty, "a fact was emitted twice across the restart")
    val cutoff = finalCutoffMs
    val got = norm(all, cutoff)
    val want = norm(batchAsOf(facts, dims), cutoff)
    assert(got === want,
      "post-restart totality must equal the batch as-of")
  }
}
