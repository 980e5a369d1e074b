package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming COUNT(DISTINCT) maintenance under retraction — the
  * streaming twin of the batch `cdc_ivm_distinct` operator, and the
  * one aggregate a plain retract stream cannot maintain without
  * auxiliary state: subtracting a count says nothing about whether
  * the VALUE is gone from the group. The standard fix is the same
  * support table the batch op uses, held here as a per-group
  * MapState[value → live-row count]:
  *
  *   +1 delta: support(v) += 1   (v enters the distinct set at 1)
  *   −1 delta: support(v) -= 1   (v leaves the set when it hits 0)
  *
  * Input is the signed (group, value, seq, sign) delta channel a
  * user-keyed LWW stage emits (StreamingRetractTopK's stage-1
  * contract — a group MOVE arrives as −1 in the old group and +1 in
  * the new). Each micro-batch re-emits the refreshed
  * (distinct, rows) pair for every touched group.
  *
  * Scale shape: state is one map entry per LIVE (group, value) — the
  * honest cost of exact distinct under retraction (the sub-linear
  * alternative is an HLL sketch, which cannot retract; that trade is
  * exactly why this operator exists). Updates shuffle-partition by
  * group; within a batch a value's retract and re-add apply in
  * (seq, sign) order so transient zero-crossings resolve
  * deterministically. RocksDB-backed via transformWithState.
  */
object StreamingDistinct {

  /** Signed support delta: sign = +1 add / −1 retract of one live row
    * carrying `value` in `group`; `seq` orders same-batch deltas.
    */
  case class SupportDelta(group: String, value: Long, seq: Long,
    sign: Int)

  /** Per-group distinct report emitted each touched micro-batch. */
  case class GroupDistinct(group: String, nDistinct: Long, nRows: Long)

  class DistinctProcessor
      extends StatefulProcessor[String, SupportDelta, GroupDistinct] {
    @transient private var support: MapState[Long, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      support = getHandle.getMapState[Long, Long]("support",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[SupportDelta],
        timerValues: TimerValues): Iterator[GroupDistinct] = {
      rows.toSeq.sortBy(d => (d.seq, d.sign)).foreach { d =>
        val cur =
          if (support.containsKey(d.value)) support.getValue(d.value)
          else 0L
        val next = cur + d.sign
        // a retract below zero means the delta channel lost an add —
        // fail loudly rather than report a wrong distinct count
        require(next >= 0,
          s"support($key, ${d.value}) would go negative")
        if (next == 0) support.removeKey(d.value)
        else support.updateValue(d.value, next)
      }
      var nd = 0L
      var nr = 0L
      val it = support.iterator()
      while (it.hasNext) { nd += 1; nr += it.next()._2 }
      Iterator.single(GroupDistinct(key, nd, nr))
    }
  }

  /** The delta channel → per-group distinct report, as a streaming
    * Dataset transform (Update: each batch refreshes touched groups).
    */
  def distinctCounts(d: Dataset[SupportDelta])
      : Dataset[GroupDistinct] = {
    import d.sparkSession.implicits._
    d.groupByKey(_.group)
      .transformWithState(new DistinctProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
