package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the stream leg of `ev_window_session`:
  * per-user inactivity-gap sessions over an event-time stream, built
  * on Spark's native `session_window` aggregation (state-store-backed
  * window MERGING — two state windows fuse when a bridging event
  * arrives, which no fixed-window groupBy can express).
  *
  * Emission contract (append mode): a session row is emitted exactly
  * once, when the watermark passes the session's end (last event +
  * gap) — at that point no event can legally extend or bridge it, so
  * the emitted (start, end, n, sum) is FINAL. Out-of-order events
  * within the lateness window merge into open sessions; events beyond
  * it are dropped by the same watermark filter
  * [[StreamingTemporalJoin.lateDrops]] accounts for.
  *
  * 100 TB shape: one shuffle on user_id; state holds only OPEN
  * sessions per user (closed ones are evicted on emission) — bounded
  * by concurrent activity, never by history. Proven == the batch
  * gaps-and-islands sessionizer and restart-safe in
  * StreamingSessionsSpec.
  */
object StreamingSessions {

  /** `events` must be a STREAMING frame with `user_id` (long),
    * `ts` (timestamp) and `vm` (long). Returns the append-mode stream
    * of finalized sessions.
    */
  def sessionize(events: DataFrame, gap: String,
      delay: String): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("vm").as("sum_vm"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"), col("sum_vm"))
}
