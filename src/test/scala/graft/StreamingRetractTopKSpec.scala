package graft

import graft.streaming.StreamingRetractTopK
import graft.streaming.StreamingRetractTopK.{Delta, TopKRow, Version}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Retract-stream top-k == the batch IVM top-k twin on the same
  * versioned fixture, across micro-batches and a durable delta
  * channel (stage-1 parquet sink → stage-2 file source), including a
  * user who MOVES groups (the case that forces the user-keyed
  * retract stage).
  */
class StreamingRetractTopKSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming retract top-k equals the batch ivm twin, " +
      "including a cross-group move") {
    // same id arithmetic as the batch fixture: base 35u+1, update
    // 35u+9 (delta, live), delete 35u+14 (delta, erase)
    def base(u: Long, g: String, vm: Long) =
      Version(35 * u + 1, u, g, vm, del = false)
    def upd(u: Long, g: String, vm: Long) =
      Version(35 * u + 9, u, g, vm, del = false)
    def del(u: Long, g: String) =
      Version(35 * u + 14, u, g, 0L, del = true)
    val phase1 =
      (1L to 6L).map(u => base(u, "A", 700 - 100 * u)) ++
        (11L to 14L).map(u => base(u, "B", 2000 - 100 * u))
    val phase2 = Seq(del(1L, "A"), del(2L, "A"),
      upd(13L, "B", 2500L), upd(12L, "A", 350L), // 12 moves B -> A
      upd(21L, "C", 50L))
    val srcDir = Files.createTempDirectory("rtk-src").toString
    Seq(phase1, phase2).foreach { ph =>
      ph.toDS().toDF().coalesce(1).write.mode("append").parquet(srcDir)
    }
    val deltaDir = Files.createTempDirectory("rtk-delta").toString
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      // stage 1: user-keyed LWW retract deltas -> durable channel
      val versions = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .as[Version]
      val q1 = StreamingRetractTopK.deltas(versions)
        .writeStream.outputMode("append")
        .format("parquet").option("path", deltaDir)
        .option("checkpointLocation",
          Files.createTempDirectory("rtk-ck1").toString)
        .trigger(Trigger.AvailableNow()).start()
      q1.awaitTermination(120000)
      // stage 2: group-keyed rank state; capture the LAST refreshed
      // leaderboard per group via foreachBatch
      val finalBoards =
        scala.collection.mutable.Map[String, Seq[TopKRow]]()
      val deltas = spark.readStream
        .schema(spark.read.parquet(deltaDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(deltaDir)
        .as[Delta]
      val q2 = StreamingRetractTopK.topK(deltas, k = 3)
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[TopKRow],
            _: Long) =>
          batch.collect().groupBy(_.group).foreach { case (g, rows) =>
            finalBoards(g) = rows.sortBy(_.rank).toSeq
          }
        }
        .option("checkpointLocation",
          Files.createTempDirectory("rtk-ck2").toString)
        .trigger(Trigger.AvailableNow()).start()
      q2.awaitTermination(120000)
      val got = finalBoards.toSeq.flatMap { case (_, rows) => rows }
        .map(r => (r.group, r.user, r.vm, r.rank))
        .sortBy(t => (t._1, t._4))
      // batch twin on the identical versioned rows
      val ev = (phase1 ++ phase2)
        .map(v => (v.seq, v.user, v.group, v.vm, v.del))
        .toDF("event_id", "user_id", "event_type", "vm", "del")
      val want = operators.Ext13Queries.ivmTopKCore(ev, k = 3, buf = 2)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSeq
      assert(got === want)
      // the mover landed in its new group and left the old one
      assert(got.exists(t => t._1 == "A" && t._2 == 12L))
      assert(!got.exists(t => t._1 == "B" && t._2 == 12L))
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
