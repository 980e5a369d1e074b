package graft

import graft.streaming.StatefulCounters
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** transformWithState running counters: stream result == batch
  * groupBy over the same rows, across multiple micro-batches.
  */
class StatefulCountersSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming top-k matches batch top-k with O(k) state") {
    val dir = Files.createTempDirectory("topk-src").toString
    val rnd = new scala.util.Random(11)
    val rows = (1 to 60).map(i =>
      (i % 3L, rnd.nextInt(1000).toLong, i.toLong))
    rows.grouped(20).foreach { chunk =>
      chunk.toDF("key", "score", "item").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[(Long, Long, Long)]
      val q = graft.streaming.StatefulCounters.runningTopK(src, k = 4)
        .writeStream.outputMode("update")
        .format("memory").queryName("topk_out")
        .option("checkpointLocation",
          Files.createTempDirectory("topk-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // last emission per (key, rank) — scores monotonically improve
      val got = spark.table("topk_out")
        .groupBy("key", "rank").agg(max("score").as("score"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
      val want = rows.groupBy(_._1).flatMap { case (k, vs) =>
        vs.map(v => (v._2, v._3)).sortBy { case (s, it) => (-s, it) }
          .take(4).zipWithIndex
          .map { case ((s, _), i) => (k, i + 1) -> s }
      }
      assert(got === want)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("running counters match batch aggregation across micro-batches") {
    val dir = Files.createTempDirectory("ctr-src").toString
    val rows = Seq(
      (1L, 10L), (2L, 5L), (1L, 7L),
      (3L, 1L), (1L, 2L), (2L, 20L))
    // three files -> three micro-batches at maxFilesPerTrigger=1
    rows.grouped(2).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("key", "value").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[(Long, Long)]
      val q = StatefulCounters.runningCounters(src)
        .writeStream.outputMode("update")
        .format("memory").queryName("ctr_out")
        .option("checkpointLocation",
          Files.createTempDirectory("ctr-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // totals are monotone per key: the max emission per key is the
      // final running value, which must equal the batch aggregate
      val got = spark.table("ctr_out")
        .groupBy("key")
        .agg(max("n").as("n"), max("total").as("total"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val want = rows.groupBy(_._1).map { case (k, vs) =>
        k -> (vs.size.toLong, vs.map(_._2).sum)
      }
      assert(got === want)
      // at least one key updated across separate micro-batches: key 1
      // appears with an intermediate n < 3 emission
      val key1Emissions = spark.table("ctr_out")
        .filter($"key" === 1L).select("n").as[Long].collect().toSet
      assert(key1Emissions.size > 1)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
