package graft

import graft.streaming.StatefulCounters
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming z-score == batch window query: the ZScoreProcessor ring
  * buffer must reproduce ev_anomaly_zscore's trailing-20 frame on the
  * same events, double-for-double (identical IEEE expression over
  * identical integer moments).
  */
class StreamingAnomalySpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming trailing-window z-scores equal the batch query") {
    // stage events in event_id order across several micro-batch files
    val dir = Files.createTempDirectory("anomaly-src").toString
    val ev = graft.Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"),
        expr("CAST(round(value * 1000) AS BIGINT)").as("vm"))
      .orderBy("event_id")
      .collect()
    ev.grouped(ev.length / 4 + 1).foreach { chunk =>
      chunk.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        .toDF("user_id", "event_id", "vm").coalesce(1)
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
      val q = StatefulCounters.anomalyScores(src, window = 20,
          minN = 5, threshold = 2.5)
        .writeStream.outputMode("update")
        .format("memory").queryName("anomaly_out")
        .option("checkpointLocation",
          Files.createTempDirectory("anomaly-ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      val got = spark.table("anomaly_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSet
      val want = graft.operators.Ext3Queries
        .anomalyZscore(spark, TestSpark.sfDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
          r.getAs[Long]("vm"), r.getAs[Double]("z"))).toSet
      assert(got === want)
      assert(got.nonEmpty)
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
