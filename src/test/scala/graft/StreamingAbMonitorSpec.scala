package graft

import graft.streaming.StreamingAbMonitor
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The streaming A/B monitor must equal its batch twins: the emitted
  * window cells equal a batch replay, the folded z trajectory equals
  * ev_ab_sequential's day rows (same day windows), and a
  * checkpointed restart neither drops nor duplicates cells.
  */
class StreamingAbMonitorSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  private lazy val ev = Tables.t(spark, TestSpark.sfDir, "events")
    .select(Tables.eventsTsMicros.as("ts"),
      (col("user_id") % 2).as("grp"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))

  test("streamed moment cells == batch replay; z trajectory == " +
      "ev_ab_sequential") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-abmon").toString
    ev.write.mode("overwrite").parquet(dir)
    val stream = StreamingAbMonitor.windowedMoments(
      spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(dir),
      windowDur = "1 day", watermarkDelay = "1 hour")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("ab_cells")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ab_cells")
    assert(got.count() > 0)
    val want = ev.groupBy(window(col("ts"), "1 day"))
      .agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("dn_a"),
        sum(when(col("grp") === 0, col("vm")).otherwise(0L)).as("ds_a"),
        sum(when(col("grp") === 0, col("vm") * col("vm"))
          .otherwise(0L)).as("dq_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("dn_b"),
        sum(when(col("grp") === 1, col("vm")).otherwise(0L)).as("ds_b"),
        sum(when(col("grp") === 1, col("vm") * col("vm"))
          .otherwise(0L)).as("dq_b"))
      .select(col("window.start").as("w_start"), col("dn_a"),
        col("ds_a"), col("dq_a"), col("dn_b"), col("ds_b"), col("dq_b"))
    // append mode emits only watermark-closed windows: the emitted
    // set must be a subset of the batch replay, cell-exact
    assert(got.exceptAll(want).isEmpty,
      "streaming emitted a cell the batch replay does not have")

    // fold the STREAMED cells and compare day-by-day with the batch
    // sequential monitor (epoch-aligned day windows == ts-div days)
    val traj = StreamingAbMonitor.zTrajectory(got).collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond / 86400) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val batch = graft.operators.Ext31Queries
      .abSequential(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(traj.nonEmpty)
    batch.foreach { case (day, na, nb, z, crossed) =>
      traj.get(day).foreach { t =>
        assert(t === ((na, nb, z, crossed)), s"day $day trajectory")
      }
    }
    // every streamed-and-closed day must agree (subset relation
    // checked above via exceptAll; here: at least half the days
    // closed, so the comparison has teeth)
    assert(traj.size * 2 >= batch.length)
  }

  test("moment cells survive a checkpointed restart without loss or " +
      "duplication") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-abmon2").toString
    val ckpt = Files.createTempDirectory("graft-abmon2-ckpt").toString
    val out = Files.createTempDirectory("graft-abmon2-out").toString
    // two slices arriving across a restart (file sink — the memory
    // sink cannot recover from a checkpoint)
    val half = ev.filter(dayofmonth(col("ts")) <= 15)
    val rest = ev.filter(dayofmonth(col("ts")) > 15)
    half.coalesce(2).write.mode("overwrite").parquet(dir)
    def run(): Unit = {
      val s = StreamingAbMonitor.windowedMoments(
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(dir),
        windowDur = "1 day", watermarkDelay = "1 hour")
      val q = s.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    run()
    val n1 = spark.read.parquet(out).count()
    rest.coalesce(2).write.mode("append").parquet(dir)
    run()
    val all = spark.read.parquet(out)
    // no window may be emitted twice across the restart
    val dups = all.groupBy("w_start").count().filter(col("count") > 1)
    assert(dups.isEmpty, "a window cell was emitted twice")
    assert(all.count() >= n1)
    // and every emitted cell equals the batch recompute of its window
    val want = ev.groupBy(window(col("ts"), "1 day"))
      .agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("dn_a"),
        sum(when(col("grp") === 0, col("vm")).otherwise(0L)).as("ds_a"),
        sum(when(col("grp") === 0, col("vm") * col("vm"))
          .otherwise(0L)).as("dq_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("dn_b"),
        sum(when(col("grp") === 1, col("vm")).otherwise(0L)).as("ds_b"),
        sum(when(col("grp") === 1, col("vm") * col("vm"))
          .otherwise(0L)).as("dq_b"))
      .select(col("window.start").as("w_start"), col("dn_a"),
        col("ds_a"), col("dq_a"), col("dn_b"), col("ds_b"), col("dq_b"))
    assert(all.exceptAll(want).isEmpty,
      "restart emitted a cell the batch replay does not have")
  }
}
