package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming quantile sketch — the stream leg of sketch_histogram /
  * cdc_ivm_hist: per tumbling event-time hour, a 32-bin fixed-width
  * histogram of the value lattice (bin = vm div 5200, top bin open),
  * emitted append-mode once the watermark closes the window. Any
  * percentile is then a bounded post-read over ≤ 32 rows per window —
  * the mergeable-sketch contract (bins add across shards and windows)
  * instead of an exact-percentile state store that would hold every
  * value.
  *
  * Emission contract: a (window, bin) row is emitted exactly once,
  * final, when the watermark passes the window end; late events inside
  * the lateness window merge into open bins, later ones are dropped by
  * the same watermark filter [[StreamingTemporalJoin.lateDrops]]
  * accounts for.
  *
  * 100 TB shape: one shuffle on (window, bin); state is bounded by
  * open windows × 32 bins, never by row count or distinct values.
  */
object StreamingQuantiles {

  /** `events` must be a STREAMING frame with `ts` (timestamp) and
    * `vm` (long). Returns the append-mode stream of finalized
    * (win_start, bin, n) histogram rows.
    */
  def binned(events: DataFrame, delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"),
        least(expr("vm div 5200"), lit(31L)).as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("win_start"), col("bin"), col("n"))

  /** Percentile readout over emitted bin rows (batch side): for each
    * window, the smallest bin whose cumulative count reaches p% of
    * the window total, for p = 50/90/99 — the sketch_histogram
    * convention, so stream-maintained bins answer the same question
    * the batch sketch does. Windows partition the cumulative scan, so
    * nothing is global.
    */
  def readout(bins: DataFrame): DataFrame = {
    val wCum = Window.partitionBy("win_start").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("win_start")
    val cum = bins
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("total", sum("n").over(wAll))
    cum.groupBy("win_start")
      .agg(max("total").as("n_total"),
        min(when(col("cum") * 100 >= col("total") * 50, col("bin")))
          .as("p50_bin"),
        min(when(col("cum") * 100 >= col("total") * 90, col("bin")))
          .as("p90_bin"),
        min(when(col("cum") * 100 >= col("total") * 99, col("bin")))
          .as("p99_bin"))
      .orderBy("win_start")
  }
}
