package graft.streaming

import graft.operators.CdcParse
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 maintenance: the batch `cdc_scd2` interval
  * build (lead()-window per entity key) re-expressed as an
  * incremental stateful operator, so dimension history is maintained
  * AS the changelog arrives instead of by nightly rebuild.
  *
  * Contract: the stream emits CLOSED intervals only (append mode — a
  * closed interval is immutable, exactly what an append sink can
  * take). The currently-open interval per key is operator state, not
  * output: emitting it would require a later retraction, which is the
  * one thing an SCD2 history must never do. A consumer needing
  * current rows unions the history with the keyed state table
  * (`KeyedTableSink` in this repo) — the same split the batch query
  * expresses as `valid_to IS NULL`.
  *
  * State per key is ONE fixed-size row (open interval + last applied
  * seq) — the honest floor for interval construction, independent of
  * history length, because every closed interval leaves state the
  * moment it is emitted. Out-of-order or replayed rows at-or-below
  * the applied seq are dropped (the at-least-once replay contract:
  * reprocessing a delivered batch must not re-close intervals).
  */
object StreamingScd2 {

  /** public: generated row encoders must be able to access these */
  case class ScdIn(user_id: Long, event_id: Long, op: String,
      event_type: String, value_milli: Long)

  case class Scd2State(hasOpen: Boolean, validFrom: Long,
      eventType: String, valueMilli: Long, lastSeq: Long)

  case class ClosedInterval(user_id: Long, valid_from: Long,
      valid_to: Long, event_type: String, value_milli: Long)

  /** `df` columns: user_id, event_id, op (CdcParse.Op*), event_type,
    * value_milli — the typed-assembly output. Returns the stream of
    * closed intervals.
    */
  def closedIntervals(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val keyed: Dataset[ScdIn] = df
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("op"), col("event_type"), col("value_milli").cast("long"))
      .as[ScdIn]
    keyed.groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, ClosedInterval](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[ScdIn],
         state: GroupState[Scd2State]) =>
          var st = state.getOption.getOrElse(
            Scd2State(hasOpen = false, 0L, "", 0L, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer
            .empty[ClosedInterval]
          // within-batch order restored here; cross-batch order is the
          // source's delivery order, staleness-guarded by lastSeq
          rows.toSeq.sortBy(_.event_id).foreach { r =>
            if (r.event_id > st.lastSeq) {
              if (st.hasOpen)
                out += ClosedInterval(uid, st.validFrom, r.event_id,
                  st.eventType, st.valueMilli)
              st =
                if (r.op == CdcParse.OpErase)
                  Scd2State(hasOpen = false, 0L, "", 0L, r.event_id)
                else
                  Scd2State(hasOpen = true, r.event_id, r.event_type,
                    r.value_milli, r.event_id)
            }
          }
          state.update(st)
          out.iterator
      }
      .toDF()
  }
}
