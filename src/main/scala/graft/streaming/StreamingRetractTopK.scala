package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Retract-stream top-k — the streaming twin of the batch
  * `cdc_ivm_topk` view, expressed as the classic two-stage retract
  * topology (Flink's retract streams; reference analog: the keyed
  * changelog contract of YdbCdcReader envelopes):
  *
  *   stage 1 (keyed by USER): per-key LWW state; each new version
  *     emits the delta pair — a RETRACT of the previously-published
  *     (group, vm) contribution and, if the new version is live, an
  *     ADD of the new one. Group CHANGES are what force this stage:
  *     a group-keyed operator alone can never remove the user's row
  *     from the group it left.
  *   stage 2 (keyed by GROUP): a MapState of user → vm applies the
  *     signed deltas and re-emits the group's refreshed top-k.
  *
  * State contract: stage 1 is one row per user (the published
  * contribution); stage 2 is one map entry per LIVE user per group —
  * the honest cost of EXACT top-k under retraction in a stream,
  * where the batch side's candidate-buffer trick does not apply
  * because there is no stored table to refetch from. At 100 TB the
  * stage-2 state is RocksDB-backed and shuffle-partitioned by group;
  * both stages scale horizontally with their key cardinality.
  *
  * The two stages are separate streaming queries joined by a durable
  * delta channel (in production a topic; in specs a parquet
  * directory) — the same decoupling the reference's changefeed gives
  * its consumers, and it sidesteps multi-stateful-operator chaining
  * limits inside one query.
  */
object StreamingRetractTopK {

  /** Versioned input row: one user's new state. */
  case class Version(seq: Long, user: Long, group: String, vm: Long,
    del: Boolean)

  /** Signed contribution delta; sign = +1 add, -1 retract. */
  case class Delta(group: String, user: Long, vm: Long, sign: Int,
    seq: Long)

  /** Published contribution a user currently has in some group. */
  case class Published(group: String, vm: Long, seq: Long,
    live: Boolean)

  /** One refreshed leaderboard row. */
  case class TopKRow(group: String, rank: Int, user: Long, vm: Long)

  class RetractProcessor
      extends StatefulProcessor[Long, Version, Delta] {
    @transient private var pub: ValueState[Published] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      pub = getHandle.getValueState[Published]("pub",
        Encoders.product[Published], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Version],
        timerValues: TimerValues): Iterator[Delta] = {
      val out = scala.collection.mutable.ArrayBuffer[Delta]()
      // LWW within the batch AND against state: apply in seq order,
      // ignore stale versions (idempotent replay — a reprocessed
      // older version must not clobber a newer published row)
      rows.toSeq.sortBy(_.seq).foreach { v =>
        val cur = Option(pub.get())
        if (!cur.exists(_.seq >= v.seq)) {
          cur.filter(_.live).foreach { c =>
            out += Delta(c.group, key, c.vm, -1, v.seq)
          }
          if (!v.del) out += Delta(v.group, key, v.vm, +1, v.seq)
          pub.update(Published(v.group, v.vm, v.seq, !v.del))
        }
      }
      out.iterator
    }
  }

  class GroupTopKProcessor(k: Int)
      extends StatefulProcessor[String, Delta, TopKRow] {
    @transient private var members: MapState[Long, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      members = getHandle.getMapState[Long, Long]("members",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Delta],
        timerValues: TimerValues): Iterator[TopKRow] = {
      // a user's retract and re-add may land in one batch — apply in
      // (seq, sign) order so the -1 precedes the +1 of the same seq
      rows.toSeq.sortBy(d => (d.seq, d.sign)).foreach { d =>
        if (d.sign < 0) members.removeKey(d.user)
        else members.updateValue(d.user, d.vm)
      }
      members.iterator().toSeq
        .sortBy { case (u, vm) => (-vm, u) }.take(k)
        .iterator.zipWithIndex
        .map { case ((u, vm), i) => TopKRow(key, i + 1, u, vm) }
    }
  }

  /** Stage 1 as a streaming Dataset transform. */
  def deltas(versions: Dataset[Version]): Dataset[Delta] = {
    import versions.sparkSession.implicits._
    versions.groupByKey(_.user)
      .transformWithState(new RetractProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Stage 2 as a streaming Dataset transform over the delta channel. */
  def topK(d: Dataset[Delta], k: Int): Dataset[TopKRow] = {
    import d.sparkSession.implicits._
    d.groupByKey(_.group)
      .transformWithState(new GroupTopKProcessor(k),
        TimeMode.None(), OutputMode.Append())
  }
}
