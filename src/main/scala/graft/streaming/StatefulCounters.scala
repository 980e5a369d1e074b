package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running totals state (count + sum of the value column). */
case class CounterState(n: Long, total: Long)

/** One output row per key per micro-batch with the running totals. */
case class KeyCounter(key: Long, n: Long, total: Long)

/** Per-key running counters via Spark 4's `transformWithState` — the
  * arbitrary-state API that supersedes `flatMapGroupsWithState`
  * (typed ValueState/ListState/MapState handles, native TTL, timers,
  * RocksDB-backed). This is the keyed generalization of the
  * reference's per-writer rows-written throughput counters
  * (`YqlWriter.java:217-231`): every micro-batch emits the updated
  * running (count, sum) for each key it touched.
  *
  * Scale shape: state is one fixed-size row per key in the state
  * store, updates are shuffle-partitioned by key, and TTL bounds the
  * keyspace for abandoned keys — the same contract StreamingDedup
  * enforces with watermark timeouts, but expressed through the new
  * API's native TTL instead of hand-rolled timeout re-arming.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass`).
  */
class CounterProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[Long, (Long, Long), KeyCounter] {

  @transient private var state: ValueState[CounterState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttlConf =
      if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
    state = getHandle.getValueState[CounterState]("counter",
      Encoders.product[CounterState], ttlConf)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[KeyCounter] = {
    val prev = Option(state.get()).getOrElse(CounterState(0L, 0L))
    var n = prev.n
    var total = prev.total
    rows.foreach { case (_, v) => n += 1; total += v }
    state.update(CounterState(n, total))
    Iterator.single(KeyCounter(key, n, total))
  }
}

/** Bounded streaming top-k per key: ListState holds at most k
  * (score, item) entries per key — the streaming analog of the TopKBy
  * bounded-heap aggregate. State is O(k) per key forever, regardless
  * of stream length; every micro-batch emits the key's refreshed
  * leaderboard.
  */
class TopKProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, Long, Long), TopKEntry] {

  @transient private var state: ListState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getListState[(Long, Long)]("topk",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[TopKEntry] = {
    val cur = scala.collection.mutable.ArrayBuffer
      .from(state.get().map(identity))
    rows.foreach { case (_, score, item) => cur += ((score, item)) }
    // keep the k best by (score desc, item asc) — deterministic ties
    val top = cur.sortBy { case (s, it) => (-s, it) }.take(k)
    state.put(top.toArray)
    top.iterator.zipWithIndex.map { case ((s, it), i) =>
      TopKEntry(key, i + 1, s, it)
    }
  }
}

case class TopKEntry(key: Long, rank: Int, score: Long, item: Long)

case class Anomaly(key: Long, seq: Long, vm: Long, z: Double)

/** Streaming trailing-window z-score: a ListState ring buffer holds
  * the last `window` quantized values per key; each event is scored
  * against the moments of the buffer INCLUDING itself — the exact
  * streaming replica of ev_anomaly_zscore's
  * `ROWS BETWEEN 19 PRECEDING AND CURRENT ROW` frame (integer moment
  * sums, one fixed IEEE expression — StreamingAnomalySpec proves
  * stream == batch on identical doubles). Rows are sorted by seq
  * within each micro-batch; cross-batch order is the source's replay
  * order (the changelog is seq-ordered). State is O(window) per key.
  */
class ZScoreProcessor(window: Int, minN: Int, threshold: Double)
    extends StatefulProcessor[Long, (Long, Long, Long), Anomaly] {

  @transient private var buf: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getListState[Long]("vmbuf", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[Anomaly] = {
    val cur = scala.collection.mutable.ArrayBuffer
      .from(buf.get().map(identity))
    val out = scala.collection.mutable.ArrayBuffer[Anomaly]()
    rows.toSeq.sortBy(_._2).foreach { case (_, seq, vm) =>
      cur += vm
      if (cur.length > window) cur.remove(0, cur.length - window)
      val n = cur.length
      if (n >= minN) {
        var s = 0L; var ss = 0L
        cur.foreach { v => s += v; ss += v * v }
        if (ss * n > s * s) {
          // identical term order to the batch SQL expression
          val z = (vm - s.toDouble / n) /
            math.sqrt((ss.toDouble - s.toDouble * s / n) / (n - 1))
          if (math.abs(z) > threshold) out += Anomaly(key, seq, vm, z)
        }
      }
    }
    buf.put(cur.toArray)
    out.iterator
  }
}

object StatefulCounters {

  /** Streaming top-k per key over (key, score, item) rows; each
    * micro-batch re-emits the key's current top-k (Update mode).
    */
  def runningTopK(events: Dataset[(Long, Long, Long)], k: Int)
      : Dataset[TopKEntry] = {
    implicit val outEnc: Encoder[TopKEntry] = Encoders.product[TopKEntry]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new TopKProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }

  /** Streaming anomaly scores over (key, seq, vm) rows — see
    * [[ZScoreProcessor]].
    */
  def anomalyScores(events: Dataset[(Long, Long, Long)], window: Int,
      minN: Int, threshold: Double): Dataset[Anomaly] = {
    implicit val outEnc: Encoder[Anomaly] = Encoders.product[Anomaly]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new ZScoreProcessor(window, minN, threshold),
        TimeMode.None(), OutputMode.Update())
  }

  /** Running (count, sum) per key over a stream of (key, value) rows;
    * emits the updated totals for every key touched in a micro-batch
    * (OutputMode.Update). `ttl` (optional) expires idle keys' state.
    */
  def runningCounters(events: Dataset[(Long, Long)],
      ttl: java.time.Duration = null): Dataset[KeyCounter] = {
    implicit val outEnc: Encoder[KeyCounter] =
      Encoders.product[KeyCounter]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new CounterProcessor(ttl), TimeMode.None(),
        OutputMode.Update())
  }
}
