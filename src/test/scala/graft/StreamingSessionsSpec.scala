package graft

import graft.streaming.StreamingSessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming sessionization must equal the batch sessionizer on
  * finalized sessions and survive a checkpointed kill-and-restart.
  */
class StreamingSessionsSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  def ev: DataFrame = Tables.t(spark, TestSpark.sfDir, "events")
    .select(col("user_id"), Tables.eventsTsMicros.as("ts"),
      round(col("value") * 1000).cast("long").as("vm"))

  /** Batch oracle: gaps-and-islands with the same 30-minute gap and
    * session_window's (start = first event, end = last event + gap)
    * convention.
    */
  def batchSessions: Set[(Long, Long, Long, Long, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("tus")
    ev.select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("vm"))
      .withColumn("new_sess",
        when(col("tus") - lag("tus", 1).over(w) > 1800000000L ||
          lag("tus", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum("new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy("user_id", "sess")
      .agg(min("tus").as("s_start"),
        (max("tus") + 1800000000L).as("s_end"),
        count(lit(1)).as("n"), sum("vm").as("sum_vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
  }

  def norm(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select(col("user_id"), unix_micros(col("session_start")),
        unix_micros(col("session_end")), col("n"), col("sum_vm"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  /** Sessions whose end is strictly below the final watermark (max
    * event time − 30 min delay) are the finalized set.
    */
  def cutoffUs: Long =
    ev.agg(max(unix_micros(col("ts")))).head().getLong(0) -
      1801L * 1000000L

  test("streaming sessions == batch gaps-and-islands on finalized " +
      "sessions") {
    val dir = Files.createTempDirectory("ss-ev").toString
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
    val q = StreamingSessions.sessionize(src, "30 minutes",
      "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_out")
      .option("checkpointLocation",
        Files.createTempDirectory("ss-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val cut = cutoffUs
    val got = norm(spark.table("ss_out")).filter(_._3 <= cut)
    val want = batchSessions.filter(_._3 <= cut)
    assert(want.nonEmpty)
    assert(got === want)
    // multi-event sessions must exist or the gap logic is untested
    assert(want.exists(_._4 > 1))
  }

  test("session state survives a checkpointed kill-and-restart") {
    val dir = Files.createTempDirectory("ss2-ev").toString
    val ckpt = Files.createTempDirectory("ss2-ckpt").toString
    val out = Files.createTempDirectory("ss2-out").toString
    ev.filter(dayofmonth(col("ts")) <= 15)
      .coalesce(2).write.mode("append").parquet(dir)
    def run(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = StreamingSessions.sessionize(src, "30 minutes",
        "30 minutes")
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
    val cut = cutoffUs
    val got = norm(spark.read.parquet(out)).filter(_._3 <= cut)
    val want = batchSessions.filter(_._3 <= cut)
    assert(got === want,
      "restart lost or duplicated finalized sessions")
  }
}
