package graft

import graft.operators.Ext41Queries
import graft.streaming.StreamingSchemaDrift
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming schema-drift monitor must equal a batch replay of
  * the same envelope stream, and survive a checkpointed restart with
  * no duplicate or lost drift counts.
  */
class StreamingSchemaDriftSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  // the identical drifted stream the batch query watches
  private lazy val env = Tables.t(spark, TestSpark.sfDir, "events")
    .select(Tables.eventsTsMicros.as("ts"), col("event_id"),
      Ext41Queries.driftedUpdateJson.as("update_json"))

  test("streaming drift counts == batch replay; totals match the " +
    "batch cdc_schema_drift report") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-sdrift").toString
    env.write.mode("overwrite").parquet(dir)
    val stream = StreamingSchemaDrift.windowedDriftCounts(
      spark.readStream.schema(env.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir),
      "update_json", Ext41Queries.ExpectedKeys,
      windowDur = "6 hours", watermarkDelay = "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sdrift_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sdrift_counts")
    val want = env
      .select(col("ts"),
        explode(json_object_keys(col("update_json"))).as("key"))
      .filter(!col("key").isInCollection(Ext41Queries.ExpectedKeys))
      .groupBy(window(col("ts"), "6 hours"), col("key"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("window.start").as("w_start"), col("key"),
        col("n_msgs"))
    assert(got.count() > 0, "no drift emitted")
    assert(got.exceptAll(want).isEmpty,
      "streaming emitted a row the batch replay does not have")
    // the folded report's per-key total equals the batch query's
    val report = StreamingSchemaDrift.driftReport(got).collect()
    assert(report.map(_.getString(0)).toSeq === Seq("region_code"))
    val batch = Ext41Queries.schemaDrift(spark, TestSpark.sfDir)
      .collect()
    // append mode only emits closed windows; on AvailableNow over
    // finite input the final watermark closes all but the last
    // in-flight window, so totals are <= batch and cover most of it
    assert(report.head.getLong(1) <= batch.head.getLong(1))
    assert(report.head.getLong(1) >
      batch.head.getLong(1) / 2, "most windows should have closed")
  }

  test("drift counts survive a checkpointed restart without " +
    "duplicates or losses") {
    import java.nio.file.Files
    val src = Files.createTempDirectory("graft-sdrift-src").toString
    val ckpt = Files.createTempDirectory("graft-sdrift-ck").toString
    val out = Files.createTempDirectory("graft-sdrift-out").toString
    val half1 = env.filter(col("event_id") % 2 === 0)
    val half2 = env.filter(col("event_id") % 2 === 1)
    half1.write.mode("overwrite").parquet(src)
    def run(): Unit = {
      val q = StreamingSchemaDrift.windowedDriftCounts(
        spark.readStream.schema(env.schema)
          .option("maxFilesPerTrigger", 2).parquet(src),
        "update_json", Ext41Queries.ExpectedKeys,
        windowDur = "6 hours", watermarkDelay = "1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run() // phase 1
    half2.write.mode("append").parquet(src)
    run() // phase 2: restart from the checkpoint, new files arrive
    val got = spark.read.parquet(out)
      .groupBy("w_start", "key").agg(sum("n_msgs").as("n_msgs"))
    val closedTotal = got.agg(sum("n_msgs")).head().getLong(0)
    val batchTotal = Ext41Queries.schemaDrift(spark, TestSpark.sfDir)
      .head().getLong(1)
    // no duplicates (each window emitted once across restarts), no
    // losses beyond the final unclosed window
    val want = env
      .select(col("ts"),
        explode(json_object_keys(col("update_json"))).as("key"))
      .filter(!col("key").isInCollection(Ext41Queries.ExpectedKeys))
      .groupBy(window(col("ts"), "6 hours"), col("key"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("window.start").as("w_start"), col("key"),
        col("n_msgs"))
    assert(got.exceptAll(want).isEmpty,
      "restart produced a row batch replay does not have " +
        "(duplicate emission)")
    assert(closedTotal <= batchTotal)
    assert(closedTotal > 0)
  }
}
