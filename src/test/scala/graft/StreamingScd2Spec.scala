package graft

import graft.streaming.StreamingScd2
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming SCD2 == batch SCD2 on the same changelog, including a
  * replayed (at-least-once) delivery: the stream of closed intervals
  * must equal the batch lead()-window's closed intervals no matter
  * how the changelog is chunked into micro-batches, and re-delivering
  * an already-applied chunk must emit nothing (the lastSeq guard).
  */
class StreamingScd2Spec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  test("stream == batch closed intervals across chunked delivery; " +
      "replay emits nothing") {
    val typed = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"),
        when(col("event_id") % 10 === 0,
          graft.operators.CdcParse.OpErase)
          .otherwise(graft.operators.CdcParse.OpUpdate).as("op"),
        col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("value_milli"))
    // batch truth: lead() closes each interval; erases close only
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val expect = typed
      .withColumn("valid_to", lead(col("event_id"), 1).over(w))
      .filter(col("op") =!= graft.operators.CdcParse.OpErase &&
        col("valid_to").isNotNull)
      .select(col("user_id"), col("event_id").as("valid_from"),
        col("valid_to"), col("event_type"), col("value_milli"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet

    val srcDir = Files.createTempDirectory("scd2-src").toString
    val ckpt = Files.createTempDirectory("scd2-ckpt").toString
    val outDir = Files.createTempDirectory("scd2-out").toString
    // three chunks in event_id order — per-key arrival order holds
    val ids = typed.agg(min("event_id"), max("event_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val cut1 = lo + (hi - lo) / 3
    val cut2 = lo + 2 * (hi - lo) / 3
    Seq(col("event_id") <= cut1,
      col("event_id") > cut1 && col("event_id") <= cut2,
      col("event_id") > cut2).foreach { f =>
      typed.filter(f).coalesce(1).write.mode("append").parquet(srcDir)
    }
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = StreamingScd2.closedIntervals(stream)
        .writeStream.outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(got.length === got.toSet.size, "duplicate closed intervals")
    assert(got.toSet === expect)
    assert(got.nonEmpty)

    // at-least-once replay: re-deliver chunk 3 — all seqs at-or-below
    // lastSeq, so the operator must emit NOTHING new
    typed.filter(col("event_id") > cut2).coalesce(1)
      .write.mode("append").parquet(srcDir)
    runOnce()
    assert(spark.read.parquet(outDir).count() === got.length.toLong,
      "replayed chunk re-closed intervals")
  }
}
