package graft

import graft.streaming.StreamingLshDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming MinHash-LSH near-dup detection: differential-tested
  * against a driver-side replay of the exact same rule (band
  * signatures from the identical projection, first-toucher-owns,
  * Jaccard-verified) — so the stateful operator's output is pinned,
  * not hand-waved.
  */
class StreamingLshDedupSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val minJ = 0.3

  // (id, seq, text): 2 arrives after 1 (exact dup), 3 is a near dup
  // of 1, 4 unrelated, 5 an exact dup of 4, 6 a near dup of 4 — and
  // the two batches split ownership across micro-batch boundaries
  val batch1 = Seq(
    (1L, 10L, "alpha beta gamma delta epsilon zeta eta theta"),
    (4L, 11L, "one two three four five six seven eight nine"))
  val batch2 = Seq(
    (2L, 20L, "alpha beta gamma delta epsilon zeta eta theta"),
    (3L, 21L, "alpha beta gamma delta epsilon zeta eta iota"),
    (5L, 22L, "one two three four five six seven eight nine"),
    (6L, 23L, "one two three four five six seven eight nine ten"))

  /** Replay the operator's rule on the driver from the SAME batch
    * projection: per bucket in (seq, id) order, first owns, later
    * docs emit (id, band, owner, jaccard) when J >= minJ.
    */
  def expected(): Set[(Long, Int, Long, Double)] = {
    val all = (batch1 ++ batch2).toDF("id", "seq", "text")
    val hits = StreamingLshDedup.bandHits(all, "id", "seq", "text")
      .select("bucket", "id", "seq", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val byText = (batch1 ++ batch2).map(t => t._1 -> t._3).toMap
    hits.groupBy(_._1).toSeq.flatMap { case (bucket, hs) =>
      val band = bucket.substring(0, bucket.indexOf('|')).toInt
      val sorted = hs.sortBy(h => (h._3, h._2))
      val ownerId = sorted.head._2
      sorted.tail.filter(_._2 != ownerId).flatMap { h =>
        val j = StreamingLshDedup.jaccard(
          StreamingLshDedup.shingleSet(byText(h._2)),
          StreamingLshDedup.shingleSet(byText(ownerId)))
        if (j >= minJ) Some((h._2, band, ownerId, j)) else None
      }
    }.toSet
  }

  test("stream collisions == driver replay of the ownership rule") {
    val dir = Files.createTempDirectory("lsh-src").toString
    batch1.toDF("id", "seq", "text").coalesce(1)
      .write.mode("append").parquet(dir)
    batch2.toDF("id", "seq", "text").coalesce(1)
      .write.mode("append").parquet(dir)
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1) // one micro-batch per file
        .parquet(dir)
      val q = StreamingLshDedup
        .collisions(src, "id", "seq", "text", minJ = minJ)
        .writeStream.outputMode("append")
        .format("memory").queryName("lsh_collisions")
        .option("checkpointLocation",
          Files.createTempDirectory("lsh-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("lsh_collisions").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
      val want = expected()
      assert(got === want)
      // structure sanity: exact dups collide in EVERY band with J=1
      assert(got.count(c => c._1 == 2L && c._3 == 1L && c._4 == 1.0)
        === 4)
      assert(got.count(c => c._1 == 5L && c._3 == 4L && c._4 == 1.0)
        === 4)
      // near dups verified above threshold against their owner
      assert(got.exists(c => c._1 == 3L && c._3 == 1L && c._4 >= minJ))
      assert(got.exists(c => c._1 == 6L && c._3 == 4L && c._4 >= minJ))
      // unrelated docs never cross-collide
      assert(!got.exists(c =>
        Set(1L, 2L, 3L)(c._1) && Set(4L, 5L, 6L)(c._3)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("ownership persists across restarts (checkpointed state)") {
    val dir = Files.createTempDirectory("lsh2-src").toString
    val ckpt = Files.createTempDirectory("lsh2-ckpt").toString
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val emitted = scala.collection.mutable.Buffer[(Long, Long)]()
    def run(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = StreamingLshDedup
        .collisions(src, "id", "seq", "text", minJ = minJ)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted ++= df.collect()
            .map(r => (r.getLong(0), r.getLong(2))); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    try {
      batch1.toDF("id", "seq", "text").coalesce(1)
        .write.mode("append").parquet(dir)
      run()
      assert(emitted.isEmpty) // owners only so far
      // "restart": new query, same checkpoint — owners must survive
      batch2.toDF("id", "seq", "text").coalesce(1)
        .write.mode("append").parquet(dir)
      run()
      val got = emitted.toSet
      assert(got.contains((2L, 1L))) // dup of a PRE-restart owner
      assert(got.contains((5L, 4L)))
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
