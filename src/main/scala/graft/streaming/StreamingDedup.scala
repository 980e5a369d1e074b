package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming exact deduplication (SURVEY.md §7.5 "exact dedup ...
  * streaming with watermark state").
  *
  * Two implementations:
  *  - `withinWatermark`: built-in `dropDuplicatesWithinWatermark` —
  *    state bounded by the watermark delay, the right default;
  *  - `firstSeen`: `flatMapGroupsWithState` with processing-time
  *    timeout — the custom-state escape hatch (pattern for dedup
  *    variants the built-in cannot express, e.g. emit-count-on-expiry).
  *
  * Both key on a content hash so payload size never enters state.
  */
object StreamingDedup {

  /** Built-in: keep the first event per content hash within the
    * watermark horizon. `df` must carry an event-time column.
    */
  def withinWatermark(df: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    df.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** CHAINED stateful operators in one streaming query (Spark 4
    * multi-stateful append mode): watermark-bounded dedup feeding a
    * tumbling-window distinct-document count. The watermark set before
    * the dedup propagates through it into the window aggregate, so
    * both operators bound their state from the single event-time
    * column — the shape of a production ingest-dedup-then-aggregate
    * pipeline (no intermediate sink, one checkpoint).
    */
  def dedupThenWindowCount(df: DataFrame, textCol: String,
      tsCol: String, delay: String, windowDur: String): DataFrame =
    withinWatermark(df, textCol, tsCol, delay)
      .groupBy(window(col(tsCol), windowDur))
      .agg(count(lit(1)).as("n_docs"))
      .select(col("window.start").as("window_start"), col("n_docs"))

  /** public: the generated row encoder must be able to access it */
  case class KeyedDoc(hash: String, id: Long)

  /** Custom state: emit only the first-seen id per hash; state times
    * out after `timeoutMs` of inactivity (bounds memory like a
    * watermark would).
    */
  def firstSeen(df: DataFrame, idCol: String, textCol: String,
      timeoutMs: Long = 3600000L): DataFrame = {
    import df.sparkSession.implicits._
    val keyed: Dataset[KeyedDoc] = df
      .select(md5(col(textCol)).as("hash"), col(idCol).cast("long").as("id"))
      .as[KeyedDoc]
    val out = keyed.groupByKey(_.hash)
      .flatMapGroupsWithState[Boolean, (String, Long)](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (hash: String, rows: Iterator[KeyedDoc],
         state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            // hash already emitted — but Spark clears a GroupState
            // timeout on every invocation, so re-arm it or this entry
            // would live forever after its first duplicate
            state.setTimeoutDuration(timeoutMs)
            Iterator.empty
          } else {
            val first = rows.minBy(_.id)
            state.update(true)
            state.setTimeoutDuration(timeoutMs)
            Iterator.single((hash, first.id))
          }
      }
    out.toDF("content_hash", "keep_id")
  }
}
