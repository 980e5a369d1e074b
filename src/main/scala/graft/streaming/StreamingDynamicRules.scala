package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Latest rule per key: LWW by `seq`. TOP-LEVEL by necessity — the
  * ValueState row encoder's generated code cannot reference a case
  * class nested inside an object (Janino compile failure + interpreted
  * fallback; StatefulCounters.CounterState set the precedent).
  */
case class DynamicRuleState(seq: Long, threshold: Long)

/** Dynamic per-key rules over a control/data channel union — the 21st
  * streaming module, and the first whose INPUT is heterogeneous: one
  * stream carries data rows to score, the other carries rule updates
  * that change how subsequent data rows are scored, with no redeploy
  * and no stored rules table. This is Spark's answer to Flink's
  * broadcast-state pattern, keyed instead of broadcast: both channels
  * are unioned into one tagged row type, shuffled by key, and a
  * per-key ValueState holds the latest rule (LWW by rule seq — a
  * stale or redelivered rule update can never regress the threshold).
  *
  * Semantics: within a micro-batch, rows apply in `seq` order, so a
  * data row is scored against the rule in effect AT ITS SEQ — exactly
  * the backward as-of join the batch twin (`ev_dynamic_rules`,
  * `AsOf.asofJoin`) computes. Across micro-batches the usual
  * chronological-delivery convention applies (a data row that arrives
  * after a later-seq rule is scored against the newer rule — the
  * same at-least-once reality every stream==batch twin in this repo
  * documents); data rows seen before any rule for their key emit
  * nothing, matching the twin's inner as-of.
  *
  * State: ONE (seq, threshold) pair per key — bounded by live keys,
  * independent of throughput; RocksDB-backed via transformWithState.
  *
  * 100 TB shape: the union is two narrow scans; the only shuffle is
  * the key partitioning both channels already need; rule cardinality
  * is |keys|, so the control channel is by construction tiny next to
  * the data channel. TRANSIENT buffering caveat: handleInputRows
  * materializes and sorts each key's rows WITHIN one micro-batch to
  * apply them in seq order, so per-batch memory for a hot key is
  * O(that key's rows in the trigger), not O(1) — persistent state
  * stays one rule per key, but trigger sizing is the backpressure
  * valve: bound `maxOffsetsPerTrigger`/`maxBytesPerTrigger` (the O1
  * admission caps) so a hot key's per-trigger slice fits in executor
  * memory. An unbounded trigger over a pathological single-key burst
  * is the one shape this module does not spill.
  */
object StreamingDynamicRules {

  /** Tagged union row: `isRule=true` carries a new threshold for the
    * key (vm = threshold); `isRule=false` is a measurement to score
    * (vm = value). `seq` totally orders both channels per key.
    */
  case class RuleRow(key: Long, seq: Long, isRule: Boolean, vm: Long)

  /** Alert: a data row that exceeded the rule in effect at its seq. */
  case class Alert(key: Long, seq: Long, vm: Long, ruleSeq: Long,
    threshold: Long)

  class RulesProcessor
      extends StatefulProcessor[Long, RuleRow, Alert] {
    @transient private var rule: ValueState[DynamicRuleState] = _

    override def init(outputMode: OutputMode,
        timeMode: TimeMode): Unit =
      rule = getHandle.getValueState[DynamicRuleState]("rule",
        Encoders.product[DynamicRuleState], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[RuleRow],
        timerValues: TimerValues): Iterator[Alert] = {
      // seq order within the batch; rules sort before data at equal
      // seq (cannot happen with disjoint channels — belt and braces)
      rows.toSeq.sortBy(r => (r.seq, !r.isRule)).flatMap { r =>
        if (r.isRule) {
          // LWW by seq: a redelivered or reordered stale rule update
          // never regresses the live threshold
          if (!rule.exists() || r.seq > rule.get().seq)
            rule.update(DynamicRuleState(r.seq, r.vm))
          None
        } else {
          val cur = if (rule.exists()) Option(rule.get()) else None
          cur.filter(c => r.vm > c.threshold)
            .map(c => Alert(key, r.seq, r.vm, c.seq, c.threshold))
        }
      }.iterator
    }
  }

  /** The union channel → alert stream (Append: alerts are final the
    * moment they are emitted — a rule change is never retroactive).
    */
  def alerts(rows: Dataset[RuleRow]): Dataset[Alert] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .transformWithState(new RulesProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
