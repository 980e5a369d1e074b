package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming sequential A/B monitor — the streaming twin of
  * `ev_ab_sequential` (Ext31Queries): per-window exact integer
  * moments per arm on the stream side, cumulative Welch z wherever
  * the sink is read.
  *
  * Split of work mirrors a production experiment monitor:
  *  - the STREAM side is watermarked tumbling-window CONDITIONAL
  *    MOMENTS (n, Σv, Σv² per arm) in append mode — one narrow
  *    projection + one windowed aggregate; state is bounded by
  *    windows-in-flight × 1 row, and the moment columns are exact
  *    BIGINTs (milli lattice), so emission order can never change a
  *    downstream number;
  *  - the MONITOR side folds the emitted window cells into the
  *    cumulative z trajectory (identical arithmetic to
  *    ev_ab_sequential — doubles only in the closed form) — a
  *    |windows|-sized computation, never the corpus.
  *
  * At 100 TB the stream side's shuffle carries per-window partial
  * moments only (map-side combine collapses each partition to ≤
  * windows rows); retractions are unnecessary because moments are
  * additive and append mode emits each window exactly once.
  */
object StreamingAbMonitor {

  /** Stream side: per tumbling window, both arms' exact moment
    * triples. `stream` needs event-time `ts` (TimestampType), `grp`
    * (0/1 long) and `vm` (milli-lattice long).
    */
  def windowedMoments(stream: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur))
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
        col("ds_a"), col("dq_a"), col("dn_b"), col("ds_b"),
        col("dq_b"))

  /** Monitor side: cumulative Welch z per closed window from the
    * sink's moment cells — identical closed form (and crossing rule)
    * to ev_ab_sequential.
    */
  def zTrajectory(cells: DataFrame): DataFrame = {
    // bounded domain: one row per CLOSED aggregation window
    // (horizon-bounded count of w_starts), not corpus-sized
    val w = Window.orderBy("w_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("n_a", sum("dn_a").over(w))
      .withColumn("s_a", sum("ds_a").over(w))
      .withColumn("q_a", sum("dq_a").over(w))
      .withColumn("n_b", sum("dn_b").over(w))
      .withColumn("s_b", sum("ds_b").over(w))
      .withColumn("q_b", sum("dq_b").over(w))
      .filter(col("n_a") >= 2 && col("n_b") >= 2)
      .withColumn("va", expr(
        "(cast(n_a as double) * cast(q_a as double)" +
          " - cast(s_a as double) * cast(s_a as double))" +
          " / (cast(n_a as double) * cast(n_a - 1 as double))"))
      .withColumn("vb", expr(
        "(cast(n_b as double) * cast(q_b as double)" +
          " - cast(s_b as double) * cast(s_b as double))" +
          " / (cast(n_b as double) * cast(n_b - 1 as double))"))
      .withColumn("z_milli", expr(
        "cast(round((cast(s_b as double) / cast(n_b as double)" +
          " - cast(s_a as double) / cast(n_a as double))" +
          " / sqrt(va / cast(n_a as double)" +
          " + vb / cast(n_b as double)) * 1000) as bigint)"))
      .withColumn("crossed", abs(col("z_milli")) >= 3000L)
      .select("w_start", "n_a", "n_b", "z_milli", "crossed")
  }
}
