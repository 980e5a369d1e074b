package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Inactivity (absence-of-events) detection — the 20th streaming
  * module, and the first whose OUTPUT is triggered by events that do
  * NOT arrive: a key that goes quiet for more than `gapMs` of EVENT
  * time raises an alarm carrying its last event and the length of the
  * activity run that just ended, unless that run ended in a terminal
  * event (the user finished, not abandoned). The abandoned-cart /
  * stuck-pipeline alarm, expressed as keyed state + event-time timers
  * so a no-data batch can fire alarms for keys with nothing new.
  *
  * Finalization contract (the rule a batch twin can replicate row for
  * row): the run ending at event `a` is CLOSED exactly when the
  * watermark reaches a.ms + gapMs — any event that could still arrive
  * has event time > watermark ≥ a.ms + gapMs and therefore cannot
  * extend the run. Closure needs the watermark even when a successor
  * event already proves the gap structurally: a late event inside
  * (a.ms, a.ms + gapMs] is admissible until the watermark passes that
  * window. Emission is append-mode and final — no retractions.
  *
  * State per key is the UNRESOLVED suffix of its event stream: runs
  * retire atomically once closed, so the buffer holds at most the
  * events of the last gap-plus-lateness window — bounded by event
  * rate × (gapMs + delay), never by history (the partition-session
  * commit-then-discard discipline, CdcReader.java:82-115).
  *
  * 100 TB shape: one shuffle keyed by user; timers are per-key state
  * the store already holds; output is |closed runs|, a corpus
  * collapse.
  */
object StreamingInactivity {

  /** public: generated row encoders must access these. `et` stays a
    * TIMESTAMP so the watermark tag survives into the state operator.
    */
  case class InactIn(user_id: Long, et: java.sql.Timestamp, id: Long,
      terminal: Boolean)

  case class InactState(buf: List[(Long, Long, Boolean)])

  case class Alarm(user_id: Long, last_ms: Long, n_run: Long)

  /** `events` columns: user_id (long), et (timestamp), id (long,
    * per-key total order for event-time ties), terminal (boolean).
    * Returns the append-mode alarm stream (user_id, last_ms, n_run).
    */
  def alarms(events: DataFrame, gapMs: Long,
      delay: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("et"),
        col("id").cast("long"), col("terminal").cast("boolean"))
      .withWatermark("et", delay)
      .as[InactIn]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step(gapMs))
      .toDF()
  }

  private[streaming] def step(gapMs: Long)(key: Long,
      rows: Iterator[InactIn],
      state: GroupState[InactState]): Iterator[Alarm] = {
    val wm = state.getCurrentWatermarkMs()
    var buf = state.getOption.map(_.buf).getOrElse(Nil)
    if (!state.hasTimedOut) rows.foreach { r =>
      buf ::= ((r.et.getTime, r.id, r.terminal))
    }
    val sorted = buf.sortBy(e => (e._1, e._2))
    // split into activity runs at structural gaps (> gapMs between
    // consecutive events of THIS key)
    val runs = sorted.foldLeft(List.empty[List[(Long, Long, Boolean)]]) {
      case (acc, e) => acc match {
        case (run @ (last :: _)) :: rest if e._1 - last._1 <= gapMs =>
          (e :: run) :: rest
        case _ => List(e) :: acc
      }
    }.map(_.reverse).reverse
    // retire the prefix of runs whose closure the watermark has
    // finalized; runs close strictly in time order, so this is a span
    val (closed, open) = runs.span(_.last._1 + gapMs <= wm)
    val out = closed.collect {
      case run if !run.last._3 =>
        Alarm(key, run.last._1, run.length.toLong)
    }
    val rest = open.flatten
    if (rest.isEmpty) state.remove()
    else {
      state.update(InactState(rest))
      // wake when the watermark reaches the earliest pending closure:
      // timers fire on wm > t, so t = close-time − 1 makes the alarm
      // fire at wm == last.ms + gapMs exactly (the contract boundary)
      val t = math.max(open.head.last._1 + gapMs - 1, wm + 1)
      state.setTimeoutTimestamp(t)
    }
    out.iterator
  }
}
