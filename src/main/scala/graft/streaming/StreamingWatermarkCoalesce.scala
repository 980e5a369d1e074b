package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-epoch pending delta (events merged since the epoch opened,
  * before its watermark close). TOP-LEVEL by necessity — the state
  * encoder's generated code cannot reference a case class nested
  * inside an object (the StatefulCounters.CounterState precedent).
  */
case class WmEpochDelta(cnt: Long, sum: Long)

/** Cumulative totals of all CLOSED epochs for the key. */
case class WmRunning(cnt: Long, sum: Long)

/** Watermark-aligned output coalescing — the 22nd streaming module,
  * and the first to use transformWithState's EVENT-TIME TIMERS
  * (`registerTimer` / `handleExpiredTimer`) rather than
  * per-input-row emission. The problem it solves is sink write
  * amplification: a key receiving thousands of updates per hour does
  * not need thousands of downstream rows — it needs ONE consolidated
  * snapshot per hour, emitted exactly when event time has provably
  * moved past that hour. Input rows only mutate state; OUTPUT happens
  * exclusively on watermark passage, one row per (key, epoch with
  * activity), carrying the key's cumulative running totals at that
  * epoch's close.
  *
  * Semantics: epoch(e) = floor(event_time / epochMs). Each input row
  * merges into its epoch's pending delta; the first row of an epoch
  * registers an event-time timer at the epoch's END. When the
  * watermark passes that end, the timer fires and every still-pending
  * epoch whose end ≤ the expiry closes IN EPOCH ORDER (out-of-order
  * rows within the watermark delay land in the right epoch because
  * closing is deferred to the timer, not done on arrival), folding
  * into the key's running totals and emitting one snapshot row each —
  * exactly the per-(key, active-epoch) cumulative aggregate the batch
  * twin (`ev_wm_coalesce`) computes with a running-sum window.
  *
  * State: the pending map holds only OPEN epochs (bounded by the
  * watermark delay / epochMs, typically 1-2 entries) plus one running
  * pair per key — bounded by live keys, independent of throughput.
  *
  * 100 TB shape: one key shuffle (the partitioning the stateful op
  * needs anyway); output volume collapses from |events| to
  * |key, active-epoch| — the coalescing IS the scale win, the sink
  * sees the consolidated rows only. RocksDB-backed state; timers are
  * per (key, epoch-end), deduplicated by registering only on an
  * epoch's first row.
  */
object StreamingWatermarkCoalesce {

  /** Input: one measurement for a key at event time `et`. */
  case class CoalesceIn(user_id: Long, et: java.sql.Timestamp,
    vm: Long)

  /** One consolidated row per (key, closed epoch with activity):
    * cumulative count/sum of everything up to that epoch's close.
    */
  case class Snapshot(user_id: Long, epoch: Long, cum_cnt: Long,
    cum_sum: Long)

  class CoalesceProcessor(epochMs: Long)
      extends StatefulProcessor[Long, CoalesceIn, Snapshot] {
    @transient private var pending: MapState[Long, WmEpochDelta] = _
    @transient private var closed: ValueState[WmRunning] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit = {
      pending = getHandle.getMapState[Long, WmEpochDelta]("pending",
        Encoders.scalaLong, Encoders.product[WmEpochDelta],
        TTLConfig.NONE)
      closed = getHandle.getValueState[WmRunning]("closed",
        Encoders.product[WmRunning], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[CoalesceIn],
        timerValues: TimerValues): Iterator[Snapshot] = {
      rows.foreach { r =>
        val epoch = Math.floorDiv(r.et.getTime, epochMs)
        val fresh = !pending.containsKey(epoch)
        val cur =
          if (fresh) WmEpochDelta(0L, 0L) else pending.getValue(epoch)
        pending.updateValue(epoch,
          WmEpochDelta(cur.cnt + 1L, cur.sum + r.vm))
        // one timer per open epoch, at its end — idempotent across
        // rows because only the epoch's FIRST row registers it
        if (fresh) getHandle.registerTimer((epoch + 1L) * epochMs)
      }
      Iterator.empty // output happens ONLY on watermark passage
    }

    override def handleExpiredTimer(key: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Snapshot] = {
      val cut = expiredTimerInfo.getExpiryTimeInMs
      // close every pending epoch whose end ≤ this expiry, oldest
      // first — robust to several timers collapsing into one batch
      // (each later timer then finds its epoch already closed/gone)
      val ready = pending.iterator()
        .filter { case (epoch, _) => (epoch + 1L) * epochMs <= cut }
        .toSeq.sortBy(_._1)
      var run =
        if (closed.exists()) closed.get() else WmRunning(0L, 0L)
      val out = ready.map { case (epoch, d) =>
        run = WmRunning(run.cnt + d.cnt, run.sum + d.sum)
        pending.removeKey(epoch)
        Snapshot(key, epoch, run.cnt, run.sum)
      }
      if (ready.nonEmpty) closed.update(run)
      out.iterator
    }
  }

  /** Event stream → one consolidated snapshot per (key, active
    * epoch), emitted when the watermark (`delay` behind max event
    * time) passes the epoch's end. Append: a snapshot is final the
    * moment its epoch closes.
    */
  def snapshots(events: Dataset[CoalesceIn], epochMs: Long,
      delay: String): Dataset[Snapshot] = {
    import events.sparkSession.implicits._
    events.withWatermark("et", delay)
      .groupByKey(_.user_id)
      .transformWithState(new CoalesceProcessor(epochMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
