package graft

import graft.streaming.{HHEntry, StreamingHeavyHitters}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Sharded SpaceSaving heavy hitters: differential vs an exact
  * driver-side replay of the same rule, plus the classic guarantees
  * against true counts.
  */
class StreamingHeavyHittersSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val capacity = 8
  private val nShards = 4

  private def shardOf(item: String): Long =
    math.floorMod(item.hashCode, nShards).toLong

  /** Zipf-ish skew: item k appears ~ 600/k times. */
  private def mkRows: Seq[(Long, Long, String)] = {
    val items = (1 to 40).flatMap { k =>
      Seq.fill(600 / k)(s"item_$k")
    }
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(items)
    shuffled.zipWithIndex.map { case (it, i) =>
      (shardOf(it), i.toLong, it)
    }
  }

  /** Write `c` as one appended parquet file and pin a strictly
    * increasing mtime on the new part files: FileStreamSource orders
    * by (mtime, path) and part-file names are randomized, so
    * same-mtime chunks could be consumed out of write order — and
    * SpaceSaving is arrival-order-dependent.
    */
  private def appendChunk(dir: String, c: Seq[(Long, Long, String)],
      i: Int): Unit = {
    val before = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).toSet
    c.toDF("shard", "seq", "item").coalesce(1)
      .write.mode("append").parquet(dir)
    val t = java.nio.file.attribute.FileTime
      .fromMillis(1600000000000L + i * 60000L)
    java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString).filterNot(before)
      .foreach(p => java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(p), t))
  }

  /** Driver-side replay of SpaceSavingProcessor's exact rule. */
  private def replay(rows: Seq[(Long, Long, String)])
      : Map[(Long, String), (Long, Long)] = {
    val byShard = rows.groupBy(_._1)
    byShard.flatMap { case (shard, rs) =>
      val cur = scala.collection.mutable.Map.empty[String, (Long, Long)]
      rs.sortBy(_._2).foreach { case (_, _, item) =>
        cur.get(item) match {
          case Some((c, e)) => cur(item) = (c + 1, e)
          case None if cur.size < capacity => cur(item) = (1L, 0L)
          case None =>
            val (vi, (vc, _)) = cur.minBy { case (it, (c, _)) =>
              (c, it)
            }
            cur -= vi
            cur(item) = (vc + 1, vc)
        }
      }
      cur.map { case (it, s) => (shard, it) -> s }
    }
  }

  test("stream summary == driver replay; guarantees vs true counts") {
    val rows = mkRows
    val dir = Files.createTempDirectory("hh-src").toString
    // three micro-batches, seq order preserved within each file and
    // across files (pinned mtimes)
    val chunk = (rows.length + 2) / 3
    rows.grouped(chunk).zipWithIndex.foreach { case (c, i) =>
      appendChunk(dir, c, i)
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
        .as[(Long, Long, String)]
      val q = StreamingHeavyHitters.heavyHitters(src, capacity)
        .writeStream.outputMode("update")
        .format("memory").queryName("hh_out")
        .option("checkpointLocation",
          Files.createTempDirectory("hh-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // current summary = max-batch rows per shard
      val all = spark.table("hh_out").as[HHEntry].collect()
      val lastBatch = all.groupBy(_.shard)
        .map { case (s, es) => s -> es.map(_.batch).max }
      val got = all
        .filter(e => e.batch == lastBatch(e.shard))
        .map(e => (e.shard, e.item) -> (e.est, e.err)).toMap
      val want = replay(rows)
      assert(got === want)

      // SpaceSaving guarantees against exact counts
      val exact = rows.groupBy(r => (r._1, r._3))
        .map { case (k, rs) => k -> rs.length.toLong }
      val shardN = rows.groupBy(_._1)
        .map { case (s, rs) => s -> rs.length.toLong }
      exact.foreach { case ((shard, item), n) =>
        if (n > shardN(shard) / capacity)
          assert(got.contains((shard, item)),
            s"heavy item $item (n=$n) missing from shard $shard")
      }
      got.foreach { case ((shard, item), (est, err)) =>
        val n = exact((shard, item))
        assert(est >= n, s"$item est $est < true $n")
        assert(est - err <= n, s"$item lower bound ${est - err} > $n")
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("summary state survives a kill-and-restart on the same " +
      "checkpoint") {
    val rows = mkRows
    val dir = Files.createTempDirectory("hh-rs-src").toString
    val ckpt = Files.createTempDirectory("hh-rs-ckpt").toString
    // first run consumes the head 80%; the tail file (written after
    // the restart) touches every shard so each re-emits its summary
    val cut = (rows.length * 8) / 10
    val head = rows.take(cut)
    val tail = rows.drop(cut)
    assert((0 until nShards).forall(s => tail.exists(_._1 == s)),
      "tail chunk must touch every shard")
    head.grouped((cut + 1) / 2).zipWithIndex.foreach { case (c, i) =>
      appendChunk(dir, c, i)
    }
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    // the memory sink refuses checkpoint recovery — collect run-2
    // emissions through foreachBatch instead (the LshDedup restart
    // spec's pattern)
    val collected =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[HHEntry]())
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[(Long, Long, String)]
      val q = StreamingHeavyHitters.heavyHitters(src, capacity)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[HHEntry],
            _: Long) =>
          df.collect().foreach(collected.add)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    try {
      runOnce()
      collected.clear() // keep only post-restart emissions
      appendChunk(dir, tail, 2)
      runOnce()
      val all = collected.toArray(Array.empty[HHEntry])
      assert(all.nonEmpty)
      val lastBatch = all.groupBy(_.shard)
        .map { case (s, es) => s -> es.map(_.batch).max }
      val got = all
        .filter(e => e.batch == lastBatch(e.shard))
        .map(e => (e.shard, e.item) -> (e.est, e.err)).toMap
      assert(got === replay(rows))
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
