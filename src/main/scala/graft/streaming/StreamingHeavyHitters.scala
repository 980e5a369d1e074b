package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** One summary row per tracked item, re-emitted each micro-batch the
  * shard is touched. `batch` is the shard's micro-batch sequence
  * number — consumers take the max-batch rows per shard as the
  * current summary.
  */
case class HHEntry(shard: Long, batch: Long, item: String, est: Long,
  err: Long)

private case class HHState(count: Long, err: Long)

/** Sharded SpaceSaving (Metwally et al., "Efficient Computation of
  * Frequent and Top-k Elements in Data Streams") — streaming heavy
  * hitters over an UNBOUNDED item domain with O(capacity) state per
  * shard: the streaming analog of the batch frequent-items sketch
  * (`q53_approx_topk`).
  *
  * Contract: the caller shards BY ITEM (e.g. `pmod(xxhash64(item),
  * nShards)`), so every occurrence of an item lands in one shard and
  * the per-shard summaries are disjoint — the global summary is their
  * union, no merge arithmetic needed. Per shard the classic
  * guarantees hold: every item whose true shard count exceeds
  * N_shard/capacity is tracked, `est >= true >= est - err`.
  *
  * Scale shape: state is a MapState of at most `capacity` entries per
  * shard; shard count scales with throughput (it is the shuffle
  * parallelism of the stateful stage); the summary emitted per batch
  * is capacity-bounded, never stream-length-bounded.
  *
  * Determinism: rows are processed in `seq` order within a
  * micro-batch (SpaceSaving is arrival-order-dependent; a stable
  * order makes replays and the differential spec exact), and
  * evictions break count ties by smallest item string.
  */
class SpaceSavingProcessor(capacity: Int)
    extends StatefulProcessor[Long, (Long, Long, String), HHEntry] {

  @transient private var entries: MapState[String, HHState] = _
  @transient private var batchSeq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    entries = getHandle.getMapState[String, HHState]("ss",
      Encoders.STRING, Encoders.product[HHState], TTLConfig.NONE)
    batchSeq = getHandle.getValueState[Long]("bseq",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, Long, String)],
      timerValues: TimerValues): Iterator[HHEntry] = {
    // the summary is tiny (<= capacity) — work on an in-memory copy,
    // write back the delta
    val cur = scala.collection.mutable.Map.empty[String, HHState]
    entries.iterator().foreach { case (it, s) => cur(it) = s }
    val evicted = scala.collection.mutable.Set.empty[String]
    rows.toSeq.sortBy(_._2).foreach { case (_, _, item) =>
      cur.get(item) match {
        case Some(s) => cur(item) = HHState(s.count + 1, s.err)
        case None if cur.size < capacity =>
          // no eviction can have happened yet in this batch (evictions
          // keep the map at capacity), so `evicted` is empty here
          cur(item) = HHState(1L, 0L)
        case None =>
          // evict the min-count entry (ties: smallest item string)
          val (vItem, vState) = cur.minBy { case (it, s) =>
            (s.count, it)
          }
          cur -= vItem
          evicted += vItem
          cur(item) = HHState(vState.count + 1, vState.count)
          evicted -= item
      }
    }
    evicted.foreach(entries.removeKey)
    cur.foreach { case (it, s) => entries.updateValue(it, s) }
    val b = Option(batchSeq.get()).getOrElse(0L) + 1
    batchSeq.update(b)
    cur.toSeq.sortBy { case (it, s) => (-s.count, it) }.iterator
      .map { case (it, s) => HHEntry(key, b, it, s.count, s.err) }
  }
}

object StreamingHeavyHitters {

  /** Heavy-hitter summaries over (shard, seq, item) rows; the shard
    * MUST be a pure function of the item. Each micro-batch re-emits
    * the touched shards' full summaries (Update mode).
    */
  def heavyHitters(events: Dataset[(Long, Long, String)],
      capacity: Int): Dataset[HHEntry] = {
    implicit val outEnc: Encoder[HHEntry] = Encoders.product[HHEntry]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new SpaceSavingProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }
}
