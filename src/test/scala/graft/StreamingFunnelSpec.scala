package graft

import graft.streaming.StreamingFunnel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming funnel == batch ev_funnel on the same events, delivered
  * in chunks, PLUS a full replay of the whole stream (the monotone
  * machine must absorb it silently). The last update-mode emission
  * per user must equal the batch query's row exactly.
  */
class StreamingFunnelSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  test("last emission per user == batch funnel; replay absorbed") {
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("us"), col("event_id"))
    val batch = graft.operators.Ext3Queries
      .funnel(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4))).toSet

    val srcDir = Files.createTempDirectory("fun-src").toString
    val ckpt = Files.createTempDirectory("fun-ckpt").toString
    val outDir = Files.createTempDirectory("fun-out").toString
    val ids = ev.agg(min("event_id"), max("event_id")).head()
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val cut = lo + (hi - lo) / 2
    Seq(col("event_id") <= cut, col("event_id") > cut).foreach { f =>
      ev.filter(f).coalesce(1).write.mode("append").parquet(srcDir)
    }
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = StreamingFunnel.funnelRows(stream)
        .writeStream.outputMode("update")
        .foreachBatch {
          (b: org.apache.spark.sql.DataFrame, id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(outDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    // latest emission per user (batch_id, then stage monotonicity)
    def latest(): Map[Long, (Long, Long, Long, Int)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getInt(4), r.getLong(5)))
        .groupBy(_._1).map { case (u, rows) =>
          val last = rows.maxBy(x => (x._6, x._5))
          u -> ((last._2, last._3, last._4, last._5))
        }
    val got = latest().map { case (u, (v, c, p, s)) => (u, v, c, p, s) }
      .toSet
    assert(got === batch)
    assert(got.nonEmpty)
    assert(got.exists(_._5 == 3), "fixture should complete some funnels")

    // full replay: monotone machine emits NOTHING new
    val countBefore = spark.read.parquet(outDir).count()
    ev.coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    assert(spark.read.parquet(outDir).count() === countBefore,
      "replay of already-absorbed events must not emit")
  }
}
