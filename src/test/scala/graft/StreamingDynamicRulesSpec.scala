package graft

import graft.streaming.StreamingDynamicRules
import graft.streaming.StreamingDynamicRules.{Alert, RuleRow}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The control/data-channel router must emit exactly the alerts its
  * batch twin (`ev_dynamic_rules`, a backward as-of join) computes,
  * under chronological delivery, and survive a checkpointed
  * kill-and-restart with live per-key rule state. A stale redelivered
  * rule update must never regress a threshold (LWW by rule seq).
  */
class StreamingDynamicRulesSpec extends AnyFunSuite
    with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  /** The tagged union channel: rules = every event_id % 10 == 0. */
  private def channel: DataFrame =
    Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id").as("key"), col("event_id").as("seq"),
        (col("event_id") % 10 === 0).as("isRule"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))

  private def twin: Set[(Long, Long, Long, Long, Long)] =
    graft.operators.Ext85Queries
      .dynamicRules(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def alertSet(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  /** Stage the channel chronologically by seq quantiles (exact cuts:
    * relativeError=0) — rules must never arrive after the data rows
    * they govern, the stream==batch convention every twin uses.
    */
  private def stageChrono(dir: String, nFiles: Int): Unit = {
    val cuts = channel.select(col("seq").cast("double").as("s"))
      .stat.approxQuantile("s",
        (1 until nFiles).map(_.toDouble / nFiles).toArray, 0.0)
      .map(_.toLong)
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    bounds.sliding(2).foreach { case Array(lo, hi) =>
      channel.filter(col("seq") > lo && col("seq") <= hi)
        .coalesce(1).write.mode("append").parquet(dir)
    }
  }

  private def run(dir: String, ckpt: String, out: String): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .as[RuleRow]
    StreamingDynamicRules.alerts(src)
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination(180000)
  }

  test("alerts == the as-of batch twin under chronological delivery") {
    withRocksDb {
      val dir = Files.createTempDirectory("dynrules-ev").toString
      val out = Files.createTempDirectory("dynrules-out").toString
      stageChrono(dir, 4)
      run(dir, Files.createTempDirectory("dynrules-ck").toString, out)
      val got = alertSet(spark.read.parquet(out))
      val want = twin
      assert(want.nonEmpty, "twin produced no alerts — dead fixture")
      assert(got === want)
    }
  }

  test("rule state survives a checkpointed kill-and-restart") {
    withRocksDb {
      val dir = Files.createTempDirectory("dynrules2-ev").toString
      val ckpt = Files.createTempDirectory("dynrules2-ck").toString
      val out = Files.createTempDirectory("dynrules2-out").toString
      val cuts = channel.select(col("seq").cast("double").as("s"))
        .stat.approxQuantile("s", Array(0.25, 0.5, 0.75), 0.0)
        .map(_.toLong)
      def stage(lo: Long, hi: Long): Unit =
        channel.filter(col("seq") > lo && col("seq") <= hi)
          .coalesce(1).write.mode("append").parquet(dir)
      stage(Long.MinValue, cuts(0)); stage(cuts(0), cuts(1))
      run(dir, ckpt, out) // phase 1, then the "kill"
      stage(cuts(1), cuts(2)); stage(cuts(2), Long.MaxValue)
      run(dir, ckpt, out) // resume: rules set in phase 1 must govern
      assert(alertSet(spark.read.parquet(out)) === twin,
        "restart lost or duplicated alerts / rule state")
    }
  }

  test("a stale redelivered rule update never regresses the " +
      "threshold (LWW by rule seq)") {
    withRocksDb {
      val dir = Files.createTempDirectory("dynrules3-ev").toString
      val out = Files.createTempDirectory("dynrules3-out").toString
      // rule seq 10 (thr 100) then seq 20 (thr 500), then a STALE
      // redelivery of seq 10 in a later batch, then a probe at 300:
      // with LWW the live rule stays (20, 500) and 300 is quiet; a
      // last-write-wins-by-arrival bug would alert it
      Seq(RuleRow(1L, 10L, true, 100L), RuleRow(1L, 20L, true, 500L))
        .toDS().coalesce(1).write.mode("append").parquet(dir)
      Seq(RuleRow(1L, 10L, true, 100L), RuleRow(1L, 30L, false, 300L),
        RuleRow(1L, 40L, false, 600L))
        .toDS().coalesce(1).write.mode("append").parquet(dir)
      run(dir, Files.createTempDirectory("dynrules3-ck").toString, out)
      val got = alertSet(spark.read.parquet(out))
      assert(got === Set((1L, 40L, 600L, 20L, 500L)))
    }
  }
}
