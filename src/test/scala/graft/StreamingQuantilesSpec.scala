package graft

import graft.streaming.StreamingQuantiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Stream-maintained histogram bins must equal the batch recompute on
  * finalized windows, the percentile readout must match the batch
  * sketch convention, and the bin state must survive a checkpointed
  * kill-and-restart.
  */
class StreamingQuantilesSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  def ev: DataFrame = Tables.t(spark, TestSpark.sfDir, "events")
    .select(Tables.eventsTsMicros.as("ts"),
      round(col("value") * 1000).cast("long").as("vm"))

  /** Batch oracle over the SAME input: hour-windowed 32-bin counts. */
  def batchBins: Set[(Long, Long, Long)] =
    ev.select(expr("unix_micros(ts) div 3600000000").as("hr"),
        least(expr("vm div 5200"), lit(31L)).as("bin"))
      .groupBy("hr", "bin").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0) * 3600L, r.getLong(1), r.getLong(2)))
      .toSet

  def norm(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(unix_timestamp(col("win_start")).as("s"),
        col("bin"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Windows fully below the final watermark are the finalized set. */
  def cutoffSec: Long =
    ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000000L -
      1860L // 30 min lateness + the hour boundary slack

  test("streaming histogram bins == batch recompute on finalized " +
      "windows; readout matches the sketch convention") {
    val dir = Files.createTempDirectory("sq-ev").toString
    // chronological thirds: the watermark must ratchet forward as
    // files arrive, or everything after the first file reads as
    // beyond-lateness and is dropped
    def third(i: Int) = {
      val d = dayofmonth(col("ts"))
      if (i == 0) d <= 10 else if (i == 1) d > 10 && d <= 20
      else d > 20
    }
    (0 until 3).foreach { i =>
      ev.filter(third(i)).coalesce(1).write.mode("append").parquet(dir)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingQuantiles.binned(src, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sq_out")
      .option("checkpointLocation",
        Files.createTempDirectory("sq-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val cut = cutoffSec
    val got = norm(spark.table("sq_out"))
      .filter(t => t._1 + 3600 <= cut)
    val want = batchBins.filter(t => t._1 + 3600 <= cut)
    assert(want.nonEmpty)
    assert(got === want)
    // readout: p50/p90/p99 bins replay from a driver-side cumulative
    val ro = StreamingQuantiles.readout(spark.table("sq_out"))
      .collect()
    assert(ro.nonEmpty)
    val binsByW = norm(spark.table("sq_out")).groupBy(_._1)
    ro.foreach { r =>
      val w = r.getTimestamp(0).toInstant.getEpochSecond
      val bs = binsByW(w).toSeq.sortBy(_._2)
      val total = bs.map(_._3).sum
      assert(r.getLong(1) === total)
      def pct(p: Long): Long = {
        var cum = 0L
        bs.collectFirst { case (_, b, n) if {
          cum += n; cum * 100 >= total * p } => b }.get
      }
      assert(r.getLong(2) === pct(50))
      assert(r.getLong(3) === pct(90))
      assert(r.getLong(4) === pct(99))
    }
  }

  test("bin state survives a checkpointed kill-and-restart") {
    val dir = Files.createTempDirectory("sq2-ev").toString
    val ckpt = Files.createTempDirectory("sq2-ckpt").toString
    val out = Files.createTempDirectory("sq2-out").toString
    ev.filter(dayofmonth(col("ts")) <= 15)
      .coalesce(2).write.mode("append").parquet(dir)
    def run(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = StreamingQuantiles.binned(src, "30 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    run() // phase 1, then the query terminates (the "kill")
    ev.filter(dayofmonth(col("ts")) > 15)
      .coalesce(2).write.mode("append").parquet(dir)
    run() // SAME checkpoint: resume
    val cut = cutoffSec
    val got = norm(spark.read.parquet(out))
      .filter(t => t._1 + 3600 <= cut)
    val want = batchBins.filter(t => t._1 + 3600 <= cut)
    assert(got === want,
      "restart lost or duplicated finalized histogram windows")
  }
}
