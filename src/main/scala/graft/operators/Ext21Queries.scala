package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 7: mergeable quantile summaries, tokenizer
  * economics, and shot keyframes.
  *
  *  - `sketch_histogram`: fixed-bin histogram quantiles — the
  *    mergeable alternative to exact percentiles. Per-shard (per
  *    event_type) histograms MERGE by cell-wise addition (the step
  *    the query performs explicitly — the 100 TB contract is that
  *    any sharding merges to the same summary), then p50/p90/p99
  *    come off the 64-row cumulative table as [lo, hi) bin brackets.
  *    Deterministic, exact-integer, error bounded by bin width.
  *  - `tok_fertility`: tokenizer-economics report per language —
  *    whitespace words vs BPE-ish subtokens vs chars; fertility
  *    (subtokens per word) and bytes-per-subtoken on the micro
  *    lattice. The go/no-go table for tokenizer choice per corpus
  *    slice.
  *  - `mm_keyframes`: one keyframe per detected shot (argmax energy,
  *    earliest frame on ties) — composes the `mm_shot_boundaries`
  *    segmentation so the two queries describe one segmentation.
  *
  * 100 TB shapes: the histogram collapses the corpus to
  * |types|×64 cells with map-side partial aggregation, the merge is
  * a 64-row aggregate, and quantile extraction is a single pass over
  * the bounded cumulative table (one 1-row conditional aggregate —
  * no per-percentile scan); fertility is one narrow projection + a
  * |langs| aggregate; keyframes ride the existing frame/segment
  * windows (per-media partitions) with one rank window per segment.
  */
object Ext21Queries {

  // ---------------------------------------------------------------
  // sketch_histogram
  // ---------------------------------------------------------------

  private val BinW = 5200L
  private val NBins = 64L

  def sketchHistogram(spark: SparkSession, dir: String): DataFrame = {
    val binned = t(spark, dir, "events")
      .select(expr("cast(round(value * 1000) as bigint)").as("vm"),
        col("event_type"))
      .withColumn("bin", least(expr(s"vm div $BinW"), lit(NBins - 1)))
    // per-shard histograms ...
    val shard = binned.groupBy("event_type", "bin")
      .agg(count(lit(1)).as("c"))
    // ... merged by cell-wise addition — the mergeability step
    val merged = shard.groupBy("bin").agg(sum("c").as("c"))
    // bounded domain: one row per histogram bin (NBins fixed)
    val wCum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("total", sum("c").over(Window.partitionBy()))
    cum.agg(max("total").as("n_total"),
        min(when(col("cum") * 100 >= col("total") * 50, col("bin")))
          .as("p50_bin"),
        min(when(col("cum") * 100 >= col("total") * 90, col("bin")))
          .as("p90_bin"),
        min(when(col("cum") * 100 >= col("total") * 99, col("bin")))
          .as("p99_bin"))
      .select(col("n_total"),
        (col("p50_bin") * BinW).as("p50_lo_milli"),
        ((col("p50_bin") + 1) * BinW).as("p50_hi_milli"),
        (col("p90_bin") * BinW).as("p90_lo_milli"),
        ((col("p90_bin") + 1) * BinW).as("p90_hi_milli"),
        (col("p99_bin") * BinW).as("p99_lo_milli"),
        ((col("p99_bin") + 1) * BinW).as("p99_hi_milli"))
  }

  // ---------------------------------------------------------------
  // tok_fertility
  // ---------------------------------------------------------------

  def tokFertility(spark: SparkSession, dir: String): DataFrame = {
    val text = col("text")
    t(spark, dir, "documents")
      .select(col("lang"),
        size(TextAnalysis.tokens(text)).cast("long").as("ws"),
        size(regexp_extract_all(text,
          lit(TextAnalysis.bpeishPattern), lit(0))).cast("long")
          .as("sub"),
        length(text).cast("long").as("chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("n_words"),
        sum("sub").as("n_subtokens"),
        sum("chars").as("n_chars"))
      .withColumn("fertility_micro",
        expr("n_subtokens * 1000000 div n_words"))
      .withColumn("chars_per_subtoken_micro",
        expr("n_chars * 1000000 div n_subtokens"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------
  // mm_keyframes
  // ---------------------------------------------------------------

  def keyframes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    val seg = Ext11Queries.energyFrameBase(spark, dir)
      .select("media_id", "frame_no", "energy")
      .withColumn("prev_e", lag("energy", 1).over(w))
      .withColumn("boundary",
        (col("prev_e").isNull
          || abs(col("energy") - col("prev_e")) > 30000).cast("long"))
      .withColumn("seg_no", sum("boundary").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wKey = Window.partitionBy("media_id", "seg_no")
      .orderBy(col("energy").desc, col("frame_no"))
    seg
      .withColumn("rn", row_number().over(wKey))
      .withColumn("n_frames",
        count(lit(1)).over(Window.partitionBy("media_id", "seg_no")))
      .filter(col("rn") === 1)
      .select(col("media_id"), col("seg_no").cast("long").as("seg_no"),
        col("frame_no").as("key_frame"),
        col("energy").as("key_energy"), col("n_frames"))
      .orderBy("media_id", "seg_no")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_histogram" -> sketchHistogram _,
    "tok_fertility" -> tokFertility _,
    "mm_keyframes" -> keyframes _,
  )

  def oracle: Map[String, String] = Map(
    "sketch_histogram" ->
      s"""WITH binned AS (
        |  SELECT least(CAST(round(value * 1000) AS BIGINT) // $BinW,
        |    ${NBins - 1}) AS bin, event_type
        |  FROM events
        |), shard AS (
        |  SELECT event_type, bin, COUNT(*) AS c
        |  FROM binned GROUP BY 1, 2
        |), merged AS (
        |  SELECT bin, CAST(SUM(c) AS BIGINT) AS c
        |  FROM shard GROUP BY bin
        |), cum AS (
        |  SELECT bin, c,
        |    CAST(SUM(c) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER () AS BIGINT) AS total
        |  FROM merged
        |), pick AS (
        |  SELECT MAX(total) AS n_total,
        |    MIN(CASE WHEN cum * 100 >= total * 50 THEN bin END)
        |      AS p50_bin,
        |    MIN(CASE WHEN cum * 100 >= total * 90 THEN bin END)
        |      AS p90_bin,
        |    MIN(CASE WHEN cum * 100 >= total * 99 THEN bin END)
        |      AS p99_bin
        |  FROM cum)
        |SELECT n_total,
        |  p50_bin * $BinW AS p50_lo_milli,
        |  (p50_bin + 1) * $BinW AS p50_hi_milli,
        |  p90_bin * $BinW AS p90_lo_milli,
        |  (p90_bin + 1) * $BinW AS p90_hi_milli,
        |  p99_bin * $BinW AS p99_lo_milli,
        |  (p99_bin + 1) * $BinW AS p99_hi_milli
        |FROM pick""".stripMargin,
    "tok_fertility" ->
      """WITH per AS (
        |  SELECT lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS ws,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS sub,
        |    CAST(length(text) AS BIGINT) AS chars
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(ws) AS BIGINT) AS n_words,
        |  CAST(SUM(sub) AS BIGINT) AS n_subtokens,
        |  CAST(SUM(chars) AS BIGINT) AS n_chars,
        |  (CAST(SUM(sub) AS BIGINT) * 1000000)
        |    // CAST(SUM(ws) AS BIGINT) AS fertility_micro,
        |  (CAST(SUM(chars) AS BIGINT) * 1000000)
        |    // CAST(SUM(sub) AS BIGINT) AS chars_per_subtoken_micro
        |FROM per GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "mm_keyframes" ->
      (s"WITH ef AS (\n${Ext11Queries.oracle("mm_energy_frames")}\n)" +
        """, b AS (
        |  SELECT media_id, frame_no, energy,
        |    CASE WHEN lag(energy) OVER
        |        (PARTITION BY media_id ORDER BY frame_no) IS NULL
        |      OR abs(energy - lag(energy) OVER
        |        (PARTITION BY media_id ORDER BY frame_no)) > 30000
        |      THEN 1 ELSE 0 END AS boundary
        |  FROM ef
        |), s AS (
        |  SELECT *, SUM(boundary) OVER (PARTITION BY media_id
        |    ORDER BY frame_no ROWS UNBOUNDED PRECEDING) AS seg_no
        |  FROM b
        |), rk AS (
        |  SELECT media_id, CAST(seg_no AS BIGINT) AS seg_no, frame_no,
        |    energy,
        |    ROW_NUMBER() OVER (PARTITION BY media_id, seg_no
        |      ORDER BY energy DESC, frame_no) AS rn,
        |    COUNT(*) OVER (PARTITION BY media_id, seg_no) AS n_frames
        |  FROM s)
        |SELECT media_id, seg_no, frame_no AS key_frame,
        |  energy AS key_energy, CAST(n_frames AS BIGINT) AS n_frames
        |FROM rk WHERE rn = 1
        |ORDER BY media_id, seg_no""".stripMargin),
  )
}
