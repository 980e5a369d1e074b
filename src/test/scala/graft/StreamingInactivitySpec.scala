package graft

import graft.operators.Ext82Queries
import graft.streaming.StreamingInactivity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The inactivity alarms the timer-driven stream raises must equal the
  * batch twin (ev_inactivity_alarms) row for row — same gap, same
  * final-watermark closure rule — and must survive a checkpointed
  * kill-and-restart without loss or duplication.
  */
class StreamingInactivitySpec extends AnyFunSuite
    with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  private val gapMs = 86400000L

  def ev: DataFrame = Tables.t(spark, TestSpark.sfDir, "events")
    .select(col("user_id"), Tables.eventsTsMicros.as("et"),
      col("event_id").as("id"),
      (col("event_type") === "purchase").as("terminal"))

  def batchTwin: Set[(Long, Long, Long)] =
    Ext82Queries.inactivityAlarms(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  def norm(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // Stage boundaries as FULL-timestamp quantiles, NOT dayofmonth
  // (r9 ADVICE: day-of-month staging is only chronological while the
  // corpus spans a single month — a wider generator would interleave
  // months, the watermark would drop late files, and the stream-vs-
  // twin assertion would fail confusingly). relativeError=0 makes
  // approxQuantile exact, so the cuts are deterministic.
  private def tsCuts(n: Int): Seq[Long] =
    ev.select(unix_millis(col("et")).cast("double").as("ms"))
      .stat.approxQuantile("ms",
        (1 until n).map(_.toDouble / n).toArray, 0.0)
      .map(_.toLong).toSeq

  private def timeSlice(lo: Option[Long], hi: Option[Long]) = {
    val ms = unix_millis(col("et"))
    lo.map(ms > _).getOrElse(lit(true)) &&
      hi.map(ms <= _).getOrElse(lit(true))
  }

  test("timer-driven inactivity alarms == the batch twin; terminal " +
      "runs suppressed; both closure paths exercised") {
    val dir = Files.createTempDirectory("inact-ev").toString
    // chronological thirds — the watermark must ratchet forward
    val cs = tsCuts(3)
    val thirds = Seq(timeSlice(None, Some(cs(0))),
      timeSlice(Some(cs(0)), Some(cs(1))),
      timeSlice(Some(cs(1)), None))
    thirds.foreach { p =>
      ev.filter(p).coalesce(1).write.mode("append").parquet(dir)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingInactivity.alarms(src, gapMs, "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("inact_out")
      .option("checkpointLocation",
        Files.createTempDirectory("inact-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val got = norm(spark.table("inact_out"))
    val want = batchTwin
    assert(want.nonEmpty)
    assert(got === want)
    // the alarm set must exercise BOTH closure paths: a run closed by
    // a successor event (a later event exists for the user) and a run
    // closed purely by the watermark timer (the user's final event) —
    // else the fixture proves only half the operator
    val lastByUser = ev.groupBy("user_id")
      .agg(max(unix_millis(col("et"))).as("mx")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.exists { case (u, ms, _) => lastByUser(u) == ms },
      "no timer-closed (trailing) alarm in the fixture")
    assert(got.exists { case (u, ms, _) => lastByUser(u) != ms },
      "no successor-closed alarm in the fixture")
    // terminal suppression: no alarm's last event is a purchase
    val terminalKeys = ev.filter(col("terminal"))
      .select(col("user_id"), unix_millis(col("et")).as("ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall { case (u, ms, _) => !terminalKeys((u, ms)) })
  }

  test("alarm state and timers survive a checkpointed " +
      "kill-and-restart") {
    val dir = Files.createTempDirectory("inact2-ev").toString
    val ckpt = Files.createTempDirectory("inact2-ckpt").toString
    val out = Files.createTempDirectory("inact2-out").toString
    // explicit chronological files: a run-length operator can't
    // tolerate watermark drops from out-of-order staging
    val cs = tsCuts(4)
    def stage(lo: Option[Long], hi: Option[Long]): Unit =
      ev.filter(timeSlice(lo, hi))
        .coalesce(1).write.mode("append").parquet(dir)
    stage(None, Some(cs(0))); stage(Some(cs(0)), Some(cs(1)))
    def run(): Unit = {
      val src = spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = StreamingInactivity.alarms(src, gapMs, "1 hour")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    run() // phase 1, then the query terminates (the "kill")
    stage(Some(cs(1)), Some(cs(2))); stage(Some(cs(2)), None)
    run() // SAME checkpoint: resume with live timers + buffered runs
    val got = norm(spark.read.parquet(out))
    assert(got === batchTwin,
      "restart lost or duplicated inactivity alarms")
  }
}
