package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — the streaming twin of
  * `DataQuality.drift` (PSI against a frozen reference window).
  *
  * Split of work mirrors how a production monitor actually runs:
  *  - the STREAM side is just watermarked tumbling-window bin counts
  *    (append mode: a window's counts emit exactly once, when the
  *    watermark closes it) with the bin edges frozen from the
  *    reference — a narrow projection + one windowed aggregate, state
  *    bounded by (windows-in-flight × bins);
  *  - the MONITOR side computes PSI per closed window from those
  *    bounded counts (add-1 smoothing over the full bin spine, the
  *    exact arithmetic of `DataQuality.drift`) wherever the sink is
  *    read — a per-window aggregate over ≤ bins rows.
  *
  * At 100 TB the stream side's shuffle carries bucket-level partial
  * counts only (map-side combine collapses each partition to ≤
  * windows × bins rows); the monitor side never touches the corpus.
  */
object StreamingDrift {

  /** Fixed-edge bucketing, identical to `DataQuality.drift`'s
    * reference-window binning (clamped to [0, bins-1]; a degenerate
    * vmin==vmax reference collapses to bucket 0). The Column-bounds
    * form keeps a batch query lazy (bounds stay a plan-embedded 1-row
    * broadcast); the Double form is for a streaming monitor whose
    * reference bounds are frozen config.
    */
  def bucketOf(value: Column, vmin: Column, vmax: Column,
      bins: Int): Column =
    when(vmax === vmin, lit(0)).otherwise(least(greatest(
      floor((value - vmin) * bins / (vmax - vmin)).cast("int"),
      lit(0)), lit(bins - 1)))

  def bucketOf(value: Column, vmin: Double, vmax: Double,
      bins: Int = 10): Column =
    if (vmax == vmin) lit(0)
    else bucketOf(value, lit(vmin), lit(vmax), bins)

  /** Stream side: per (tumbling window, bucket) counts in append mode.
    * `stream` needs an event-time `ts` TimestampType column and a
    * `value` DoubleType column.
    */
  def windowedBinCounts(stream: DataFrame, vmin: Double, vmax: Double,
      windowDur: String, watermarkDelay: String,
      bins: Int = 10): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .filter(col("value").isNotNull)
      .withColumn("bucket", bucketOf(col("value"), vmin, vmax, bins))
      .groupBy(window(col("ts"), windowDur), col("bucket"))
      .agg(count(lit(1)).as("cur_cnt"))
      .select(col("window.start").as("w_start"), col("bucket"),
        col("cur_cnt"))

  /** Monitor side: PSI per window from the sink's (w_start, bucket,
    * cur_cnt) rows vs the reference's (bucket, ref_cnt) rows —
    * add-1 smoothed over the full 0..bins-1 spine so empty bins
    * contribute their term (DataQuality.drift's formula verbatim),
    * rounded to 6 decimals.
    */
  def psiPerWindow(counts: DataFrame, refCounts: DataFrame,
      bins: Int = 10): DataFrame = {
    // full reference spine (bins rows, zero-filled) — built off an
    // independent range source, so `counts` is touched exactly ONCE
    // below (a self-join spine over a streaming memory sink trips
    // ambiguous-reference resolution)
    val fullRef = refCounts.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bucket"))
      .join(broadcast(refCounts), Seq("bucket"), "left")
      .withColumn("ref_cnt", coalesce(col("ref_cnt"), lit(0L)))
    // collapse each window to a bucket->count map (≤ bins entries),
    // then expand against the spine
    val perWin = counts.groupBy("w_start")
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("cur_cnt")))).as("m"))
      .crossJoin(broadcast(fullRef))
      .withColumn("cur_cnt",
        coalesce(element_at(col("m"), col("bucket")), lit(0L)))
    val withTot = perWin
      .withColumn("ref_n",
        sum("ref_cnt").over(org.apache.spark.sql.expressions.Window
          .partitionBy("w_start")))
      .withColumn("cur_n",
        sum("cur_cnt").over(org.apache.spark.sql.expressions.Window
          .partitionBy("w_start")))
      .withColumn("nb", lit(bins.toLong))
    withTot
      .withColumn("p", (col("ref_cnt") + 1).cast("double")
        / (col("ref_n") + col("nb")).cast("double"))
      .withColumn("q", (col("cur_cnt") + 1).cast("double")
        / (col("cur_n") + col("nb")).cast("double"))
      .groupBy("w_start")
      .agg(max("cur_n").as("n_cur"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))),
          6).as("psi"))
      .withColumn("drifted", col("psi") > 0.1)
      .orderBy("w_start")
  }
}
