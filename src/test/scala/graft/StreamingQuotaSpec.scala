package graft

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming per-key quota: cap enforced across micro-batches, with
  * deterministic within-batch admission order.
  */
class StreamingQuotaSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("a cap beyond Int.MaxValue admits everything (no toInt wrap)") {
    val dir = Files.createTempDirectory("quota-big-src").toString
    Seq(("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("src", "id").coalesce(1).write.mode("append").parquet(dir)
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema).parquet(dir)
      val q = graft.streaming.StreamingQuota
        .capPerKey(src, "src", "id", cap = 3000000000L)
        .writeStream.outputMode("append")
        .format("memory").queryName("quota_big_out")
        .option("checkpointLocation",
          Files.createTempDirectory("quota-big-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      assert(spark.table("quota_big_out").count() === 3L)
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("quota admits exactly cap rows per key across batches, by arrival") {
    val dir = Files.createTempDirectory("quota-src").toString
    // batch 1: a gets ids 10..13, b gets 20..21
    Seq(("a", 13L), ("a", 10L), ("a", 12L), ("a", 11L),
      ("b", 21L), ("b", 20L))
      .toDF("src", "id").coalesce(1).write.mode("append").parquet(dir)
    // batch 2: a over quota, b fills up, c starts fresh
    Seq(("a", 1L), ("a", 2L), ("b", 22L), ("b", 23L), ("b", 24L),
      ("c", 30L))
      .toDF("src", "id").coalesce(1).write.mode("append").parquet(dir)
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val ckpt = Files.createTempDirectory("quota-ckpt").toString
      val outDir = Files.createTempDirectory("quota-out").toString
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema(spark.read.parquet(dir).schema)
          .option("maxFilesPerTrigger", 1).parquet(dir)
        val q = graft.streaming.StreamingQuota
          .capPerKey(src, "src", "id", cap = 3)
          .writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
      }
      runOnce()
      def admitted(): Set[(String, Long)] = spark.read.parquet(outDir)
        .as[(String, Long)].collect().toSet
      val got = admitted()
      // a: the 3 smallest of batch 1's four rows fill the quota; batch
      //    2's even smaller ids (1, 2) arrive after exhaustion and are
      //    rejected — quota is by arrival, not a global hash lottery
      // b: 2 from batch 1 + 1 more (smallest of batch 2)
      // c: its single row
      assert(got === Set(("a", 10L), ("a", 11L), ("a", 12L),
        ("b", 20L), ("b", 21L), ("b", 22L), ("c", 30L)))
      // restart continuation: budgets live in the checkpointed state,
      // so a new query over NEW data must not re-admit exhausted keys
      Seq(("a", 3L), ("b", 25L), ("c", 31L), ("c", 32L), ("c", 33L))
        .toDF("src", "id").coalesce(1).write.mode("append").parquet(dir)
      runOnce()
      // a and b are full from the first run; c admits 2 more
      assert(admitted() -- got === Set(("c", 31L), ("c", 32L)))
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
