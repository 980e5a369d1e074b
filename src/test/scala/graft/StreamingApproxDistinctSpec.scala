package graft

import graft.streaming.{ADEntry, HllSketch, StreamingApproxDistinct}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming HLL distinct counts: differential vs a driver-side
  * replay of the identical register rule, accuracy vs exact distinct,
  * and state survival across a kill-and-restart.
  */
class StreamingApproxDistinctSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = 9 // 512 registers -> ~4.6% standard error

  /** 3 groups with known distinct cardinalities 50 / 400 / 1500, plus
    * heavy duplication (each item appears 3x).
    */
  private def mkRows: Seq[(String, String)] = {
    val gs = Seq(("small", 50), ("mid", 400), ("big", 1500))
    val rows = gs.flatMap { case (g, n) =>
      (0 until n).flatMap(i => Seq.fill(3)((g, s"u${g}_$i")))
    }
    new scala.util.Random(11).shuffle(rows)
  }

  private def replay(rows: Seq[(String, String)])
      : Map[String, Long] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val regs = new Array[Byte](1 << p)
      rs.foreach { case (_, item) => HllSketch.update(regs, p, item) }
      g -> HllSketch.estimate(regs, p)
    }

  /** transformWithState needs the multi-column-family RocksDB state
    * store provider.
    */
  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("register updates are idempotent and order-independent " +
      "(replay safety)") {
    val items = (0 until 300).map(i => s"it_$i")
    val a = new Array[Byte](1 << p)
    items.foreach(HllSketch.update(a, p, _))
    val b = new Array[Byte](1 << p)
    // reversed order + every item twice
    (items.reverse ++ items).foreach(HllSketch.update(b, p, _))
    assert(a.toSeq === b.toSeq)
  }

  test("stream estimates == driver replay; error within HLL bounds") {
    withRocksDb {
    val rows = mkRows
    val dir = Files.createTempDirectory("ad-src").toString
    val chunk = (rows.length + 2) / 3
    rows.grouped(chunk).foreach { c =>
      c.toDF("group", "item").coalesce(1)
        .write.mode("append").parquet(dir)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .as[(String, String)]
    val q = StreamingApproxDistinct.approxDistinct(src, p)
      .writeStream.outputMode("update")
      .format("memory").queryName("ad_out")
      .option("checkpointLocation",
        Files.createTempDirectory("ad-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val all = spark.table("ad_out").as[ADEntry].collect()
    val lastBatch = all.groupBy(_.group)
      .map { case (g, es) => g -> es.map(_.batch).max }
    val got = all.filter(e => e.batch == lastBatch(e.group))
      .map(e => e.group -> e.estimate).toMap
    assert(got === replay(rows))
    // accuracy: within 5 standard errors of the exact cardinality
    val exact = rows.groupBy(_._1)
      .map { case (g, rs) => g -> rs.map(_._2).distinct.length }
    val se = 1.04 / math.sqrt((1 << p).toDouble)
    exact.foreach { case (g, n) =>
      val rel = math.abs(got(g) - n.toDouble) / n
      assert(rel <= 5 * se, s"$g: est ${got(g)} vs exact $n")
    }
    }
  }

  test("registers survive a kill-and-restart on the same checkpoint " +
      "(estimate keeps growing, never resets)") {
    withRocksDb {
    val rows = mkRows
    val dir = Files.createTempDirectory("ad-rs-src").toString
    val ckpt = Files.createTempDirectory("ad-rs-ckpt").toString
    val cut = (rows.length * 7) / 10
    rows.take(cut).toDF("group", "item").coalesce(1)
      .write.mode("append").parquet(dir)

    // the memory sink refuses checkpoint recovery — collect run-2
    // emissions through foreachBatch (the heavy-hitters restart
    // spec's pattern)
    val collected = java.util.Collections.synchronizedList(
      new java.util.ArrayList[ADEntry]())
    def run(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[(String, String)]
      val q = StreamingApproxDistinct.approxDistinct(src, p)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.Dataset[ADEntry],
            _: Long) =>
          df.collect().foreach(collected.add)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    collected.clear() // keep only post-restart emissions
    rows.drop(cut).toDF("group", "item").coalesce(1)
      .write.mode("append").parquet(dir)
    run()
    val all = collected.toArray(Array.empty[ADEntry])
    assert(all.nonEmpty)
    val lastBatch = all.groupBy(_.group)
      .map { case (g, es) => g -> es.map(_.batch).max }
    val got = all.filter(e => e.batch == lastBatch(e.group))
      .map(e => e.group -> e.estimate).toMap
    // run 2 saw only the tail rows; matching the full-stream replay
    // proves the head's registers were recovered from the checkpoint
    assert(got === replay(rows))
    }
  }
}
