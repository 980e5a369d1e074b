package graft

import graft.streaming.StreamingWatermarkCoalesce
import graft.streaming.StreamingWatermarkCoalesce.CoalesceIn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The watermark-coalescing processor must emit exactly the
  * (key, active-epoch) cumulative snapshots its batch twin
  * (`ev_wm_coalesce`) computes, for every epoch the FINAL watermark
  * closes — and nothing for still-open epochs. Epoch closure is the
  * timer contract: a timer at epoch end fires once the watermark
  * (max event time − delay) passes it, so the closed set is
  * epochs with (epoch+1)·epochMs ≤ max(et) − delayMs. Restart must
  * neither lose pending epochs nor re-emit closed ones.
  */
class StreamingWatermarkCoalesceSpec extends AnyFunSuite
    with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EpochMs = 3600000L // hourly, the ts_* convention
  private val DelayMs = 1800000L // 30 min watermark delay

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

  private def channel: DataFrame =
    Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), Tables.eventsTsMicros.as("et"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))

  /** The batch twin restricted to epochs the final watermark closes:
    * the stream==batch closure rule, encoded exactly (memory: last
    * watermark = max(et) − delay; a timer at T fires when the
    * watermark reaches T).
    */
  private def closedTwin: Set[(Long, Long, Long, Long)] = {
    val maxEtMs = channel.agg(max(unix_millis(col("et"))))
      .collect()(0).getLong(0)
    val wm = maxEtMs - DelayMs
    graft.operators.Ext87Queries.wmCoalesce(spark, TestSpark.sfDir)
      .filter((col("epoch") + 1) * EpochMs <= wm)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
  }

  private def snapSet(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet

  /** Chronological staging by exact et quantiles — the stream==batch
    * delivery convention every twin in this repo uses.
    */
  private def stageChrono(dir: String, nFiles: Int): Unit = {
    val cuts = channel
      .select(unix_millis(col("et")).cast("double").as("s"))
      .stat.approxQuantile("s",
        (1 until nFiles).map(_.toDouble / nFiles).toArray, 0.0)
      .map(_.toLong)
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    bounds.sliding(2).foreach { case Array(lo, hi) =>
      channel.filter(unix_millis(col("et")) > lo
          && unix_millis(col("et")) <= hi)
        .coalesce(1).write.mode("append").parquet(dir)
    }
  }

  private def run(dir: String, ckpt: String, out: String): Unit = {
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .as[CoalesceIn]
    StreamingWatermarkCoalesce
      .snapshots(src, EpochMs, "30 minutes")
      .toDF().writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .trigger(Trigger.AvailableNow()).start()
      .awaitTermination(180000)
  }

  test("snapshots == the cumulative batch twin on every epoch the " +
      "final watermark closes; open epochs emit nothing") {
    withRocksDb {
      val dir = Files.createTempDirectory("wmc-ev").toString
      val out = Files.createTempDirectory("wmc-out").toString
      stageChrono(dir, 4)
      run(dir, Files.createTempDirectory("wmc-ck").toString, out)
      val got = snapSet(spark.read.parquet(out))
      val want = closedTwin
      assert(want.nonEmpty, "twin closed no epochs — dead fixture")
      assert(got === want)
      // the coalescing must actually coalesce: one output row per
      // (key, active closed epoch), strictly fewer than input events
      // in those epochs
      assert(got.size.toLong <
        channel.count(), "no write-amplification win")
    }
  }

  test("pending epochs and running totals survive a checkpointed " +
      "kill-and-restart") {
    withRocksDb {
      val dir = Files.createTempDirectory("wmc2-ev").toString
      val ckpt = Files.createTempDirectory("wmc2-ck").toString
      val out = Files.createTempDirectory("wmc2-out").toString
      val cuts = channel
        .select(unix_millis(col("et")).cast("double").as("s"))
        .stat.approxQuantile("s", Array(0.25, 0.5, 0.75), 0.0)
        .map(_.toLong)
      def stage(lo: Long, hi: Long): Unit =
        channel.filter(unix_millis(col("et")) > lo
            && unix_millis(col("et")) <= hi)
          .coalesce(1).write.mode("append").parquet(dir)
      stage(Long.MinValue, cuts(0)); stage(cuts(0), cuts(1))
      run(dir, ckpt, out) // phase 1, then the "kill"
      stage(cuts(1), cuts(2)); stage(cuts(2), Long.MaxValue)
      run(dir, ckpt, out) // resume: phase-1 epochs must stay closed
      assert(snapSet(spark.read.parquet(out)) === closedTwin,
        "restart lost pending epochs or re-emitted closed ones")
    }
  }

  test("out-of-order rows within the delay land in their OWN epoch, " +
      "not the arrival epoch, and snapshots stay cumulative") {
    withRocksDb {
      val dir = Files.createTempDirectory("wmc3-ev").toString
      val out = Files.createTempDirectory("wmc3-out").toString
      def ts(h: Long, m: Long): java.sql.Timestamp =
        new java.sql.Timestamp(h * EpochMs + m * 60000L)
      // epoch 0: two rows; epoch 1: one row PLUS a late epoch-0 row
      // arriving after epoch-1 rows (inside the 30-min delay);
      // epoch 3's row only advances the watermark (stays open:
      // 4h > 3h35m - 30m)
      Seq(CoalesceIn(7L, ts(0, 10), 5L), CoalesceIn(7L, ts(0, 40), 7L))
        .toDS().coalesce(1).write.mode("append").parquet(dir)
      Seq(CoalesceIn(7L, ts(1, 20), 11L),
        CoalesceIn(7L, ts(0, 55), 2L)) // late, same file = same batch
        .toDS().coalesce(1).write.mode("append").parquet(dir)
      Seq(CoalesceIn(7L, ts(3, 35), 100L))
        .toDS().coalesce(1).write.mode("append").parquet(dir)
      run(dir, Files.createTempDirectory("wmc3-ck").toString, out)
      val got = snapSet(spark.read.parquet(out))
      // epoch 0 closes with ALL THREE epoch-0 rows (5+7+2) even
      // though one arrived after epoch-1 traffic; epoch 1 closes
      // cumulative; epoch 3 stays open
      assert(got === Set((7L, 0L, 3L, 14L), (7L, 1L, 4L, 25L)))
    }
  }
}
