package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming schema-drift monitor — the streaming twin of
  * `Ext41Queries.schemaDrift`: flags envelope payload keys the
  * pipeline schema does not declare, as they arrive.
  *
  * Shape: the stream side explodes `json_object_keys` of the update
  * payload (a narrow projection — no state), filters to unexpected
  * keys (on real streams a vanishing fraction), and aggregates per
  * (tumbling window, key) in append mode under a watermark. State is
  * bounded by windows-in-flight × |distinct unexpected keys| — the
  * monitor never holds corpus-scale state, exactly like the
  * reference's per-reader counters (WebController.java:25-38) would
  * surface a parse anomaly. The monitor side (wherever the sink is
  * read) folds the windowed counts into per-key totals + first/last
  * window — a ≤ |keys × windows| aggregate.
  */
object StreamingSchemaDrift {

  /** Stream side: per (window, unexpected key) counts, append mode.
    * `stream` needs an event-time `ts` TimestampType column and the
    * JSON payload in `jsonCol`.
    */
  def windowedDriftCounts(stream: DataFrame, jsonCol: String,
      expected: Seq[String], windowDur: String,
      watermarkDelay: String): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .select(col("ts"),
        explode(json_object_keys(col(jsonCol))).as("key"))
      .filter(!col("key").isInCollection(expected))
      .groupBy(window(col("ts"), windowDur), col("key"))
      .agg(count(lit(1)).as("n_msgs"))
      .select(col("window.start").as("w_start"), col("key"),
        col("n_msgs"))

  /** Monitor side: fold the sink's windowed counts into per-key
    * totals with first/last affected window.
    */
  def driftReport(sink: DataFrame): DataFrame =
    sink.groupBy("key")
      .agg(sum("n_msgs").as("n_msgs"),
        min("w_start").as("first_window"),
        max("w_start").as("last_window"))
      .orderBy("key")
}
