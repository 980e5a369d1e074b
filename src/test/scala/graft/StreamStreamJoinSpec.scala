package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Stream-stream inner join with watermarks + event-time range
  * condition (the Structured Streaming capability SURVEY §2.3 lists as
  * absent in the reference): purchases joined to subsequent events of
  * the same user within 10 minutes; result must equal the batch
  * interval join.
  */
class StreamStreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("purchase -> follow-up events join equals batch answer") {
    val dir = Files.createTempDirectory("ssj").toString
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        Tables.eventsTsMicros.as("ts"))
    ev.coalesce(2).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)

    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "30 minutes")
    val follow = src
      .select(col("event_id").as("f_id"), col("user_id").as("f_user"),
        col("ts").as("f_ts"))
      .withWatermark("f_ts", "30 minutes")
    val joined = purchases.join(follow,
      col("p_user") === col("f_user") &&
        col("f_ts") > col("p_ts") &&
        col("f_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = spark.table("ssj_out").select("p_id", "f_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val evB = ev
    val pB = evB.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val fB = evB.select(col("event_id").as("f_id"),
      col("user_id").as("f_user"), col("ts").as("f_ts"))
    val want = pB.join(fB,
        col("p_user") === col("f_user") &&
          col("f_ts") > col("p_ts") &&
          col("f_ts") <= col("p_ts") + expr("INTERVAL 10 MINUTES"))
      .select("p_id", "f_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }
}
