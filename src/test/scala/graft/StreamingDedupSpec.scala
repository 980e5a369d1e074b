package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingDedupSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A corpus with duplicates split across files (micro-batches). */
  def stageCorpus(): (String, Long) = {
    val dir = Files.createTempDirectory("dedup-stream").toString
    val docs = Seq(
      (1L, "alpha beta", "2024-01-01 00:00:01"),
      (2L, "gamma delta", "2024-01-01 00:00:02"),
      (3L, "alpha beta", "2024-01-01 00:00:03"), // dup of 1
      (4L, "epsilon", "2024-01-01 00:10:00"),
      (5L, "gamma delta", "2024-01-01 00:11:00"), // dup of 2
      (6L, "zeta", "2024-01-01 00:12:00"))
    docs.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("doc_id", "text", "ts_s")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.parquet(f"$dir/chunk$i%02d")
    }
    // streaming source reads a flat dir: re-stage as one dir of files
    val flat = Files.createTempDirectory("dedup-flat").toString
    val all = spark.read.parquet(s"$dir/chunk*")
    all.coalesce(1).write.mode("overwrite").parquet(flat)
    (flat, 4L) // 6 docs, 2 dups -> 4 distinct
  }

  test("chained stateful ops: dedup then windowed count, one query") {
    val dir = Files.createTempDirectory("dedup-chain").toString
    // dups arrive within the 10-min delay of their originals; the
    // final far-future event advances the watermark to 00:50 so both
    // real windows close and emit
    val batches = Seq(
      Seq((1L, "alpha beta", "2024-01-01 00:00:30"),
        (2L, "gamma delta", "2024-01-01 00:04:30")),
      Seq((3L, "alpha beta", "2024-01-01 00:03:00"), // dup of 1
        (4L, "epsilon", "2024-01-01 00:05:30")),
      Seq((5L, "gamma delta", "2024-01-01 00:06:00"), // dup of 2
        (6L, "omega", "2024-01-01 01:00:00"))) // watermark push
    batches.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("doc_id", "text", "ts_s")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingDedup.dedupThenWindowCount(src, "text", "ts",
        delay = "10 minutes", windowDur = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_chain")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_chain").collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").toString
        -> r.getAs[Long]("n_docs")).toMap
    // w[00:00,00:05): docs 1+2 (dup 3 dropped by the dedup stage);
    // w[00:05,00:10): doc 4 (dup 5 dropped); doc 6's window stays open
    assert(got === Map("2024-01-01 00:00:00.0" -> 2L,
      "2024-01-01 00:05:00.0" -> 1L))
  }

  test("dropDuplicatesWithinWatermark keeps one row per content hash") {
    val (dir, distinct) = stageCorpus()
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingDedup.withinWatermark(src, "text", "ts", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("dedup_wm").count() === distinct)
  }

  test("firstSeen custom state emits exactly first id per hash") {
    val (dir, distinct) = stageCorpus()
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingDedup.firstSeen(src, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_fs")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_fs")
      .select("keep_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 4L, 6L))
  }
}
