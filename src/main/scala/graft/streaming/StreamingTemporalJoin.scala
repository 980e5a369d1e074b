package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment against a CHANGING dimension: facts and
  * dimension-version changelogs arrive as two streams, and every fact
  * is decorated with the dimension version in force AT ITS EVENT TIME
  * (latest version_ts <= fact_ts) — the temporal/as-of join the batch
  * side plans via `AsOf`, re-expressed as a stateful streaming
  * operator so enrichment tracks the dimension as it changes instead
  * of joining a stale static snapshot.
  *
  * Built on `flatMapGroupsWithState` over the UNION of the two inputs
  * keyed by the join key (the standard two-input workaround: Spark's
  * stream-stream equi-join cannot express "latest version at-or-before"
  * without a per-fact aggregate after the join; a keyed state operator
  * expresses it directly and keeps state bounded).
  *
  * Correctness contract: a fact is emitted only once the watermark
  * passes its event time — at that point no dimension version with
  * version_ts <= fact_ts can still arrive (the watermark guarantee),
  * so the emitted enrichment is FINAL (append mode, no retraction).
  * Facts newer than the watermark wait in state; an event-time timeout
  * flushes them when the watermark advances with no new rows for the
  * key (Spark's no-data batch fires the timeout).
  *
  * State per key is bounded by construction, independent of history
  * length: pending facts live at most one lateness window, and the
  * version history is COMPACTED to (versions newer than the watermark)
  * + (the single newest version at-or-below it) — any older version
  * can never be the as-of answer for a future fact, whose event time
  * must exceed the watermark. This is the partition-session discipline
  * of the reference reader (CdcReader.java:82-115) applied to join
  * state: commit, then discard.
  *
  * 100 TB shape: one shuffle on the join key for the union (identical
  * to what any keyed enrichment pays), state store holds O(pending
  * facts + live versions) per key — never the fact history, never the
  * version history.
  */
object StreamingTemporalJoin {

  /** public: generated row encoders must be able to access these.
    * `et` stays a TIMESTAMP end-to-end: the watermark tag lives on the
    * column's metadata, and converting to millis before the state
    * operator would strip it (the UnsupportedOperationChecker then
    * rejects EventTimeTimeout).
    */
  case class TjIn(key: Long, kind: Int, et: java.sql.Timestamp,
      id: Long, vm: Long)

  case class TjState(versions: List[(Long, Long)],
      pending: List[(Long, Long, Long)])

  case class Enriched(key: Long, fact_id: Long, ft_ms: Long,
      fact_vm: Long, dim_vt_ms: Option[Long], dim_vm: Option[Long])

  /** `facts` columns: key (long), ft (timestamp), fact_id (long),
    * fact_vm (long). `dims` columns: key (long), vt (timestamp),
    * dim_vm (long). Both must be streaming frames; `delay` is the
    * shared watermark lateness. Returns the append-mode stream of
    * final enrichments (left-outer: a fact with no version in force
    * carries nulls).
    */
  def enrich(facts: DataFrame, dims: DataFrame,
      delay: String): DataFrame = {
    val spark = facts.sparkSession
    import spark.implicits._
    // watermark each input BEFORE the union: the union's watermark is
    // the min of the two, which is exactly the "no earlier version can
    // still arrive" guarantee the emission rule relies on
    val f = facts
      .select(col("key").cast("long"), col("ft").as("et"),
        col("fact_id").cast("long").as("id"),
        col("fact_vm").cast("long").as("vm"))
      .withColumn("kind", lit(1))
      .withWatermark("et", delay)
    val d = dims
      .select(col("key").cast("long"), col("vt").as("et"),
        lit(0L).as("id"), col("dim_vm").cast("long").as("vm"))
      .withColumn("kind", lit(0))
      .withWatermark("et", delay)
    val unioned: Dataset[TjIn] = f.unionByName(d)
      .select(col("key"), col("kind"), col("et"), col("id"), col("vm"))
      .as[TjIn]
    unioned.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
      .toDF()
      .select(col("key"), col("fact_id"),
        timestamp_millis(col("ft_ms")).as("ft"), col("fact_vm"),
        timestamp_millis(col("dim_vt_ms")).as("dim_vt"), col("dim_vm"))
  }

  /** Dead-letter accounting (the streaming analog of
    * `cdc_dead_letter`): rows that arrive BEYOND the lateness window
    * — event time already at-or-below the operator's watermark — are
    * dropped by the state operator's late-event filter before they
    * reach [[step]], exactly as the emission contract requires (their
    * enrichment was already finalized; admitting them would emit a
    * duplicate or a retraction). Spark counts every such drop in the
    * stateful operator's `numRowsDroppedByWatermark` metric; this
    * helper folds the query's progress history into the cumulative
    * dead-letter count an operator alarms on.
    *
    * Scope: reads `recentProgress` (bounded ring, default 100
    * entries) — for a long-running monitor, sample it periodically or
    * attach a StreamingQueryListener and fold the same field; the
    * spec-proven contract here is that the count is EXACT per
    * progress entry.
    */
  def lateDrops(q: org.apache.spark.sql.streaming.StreamingQuery)
      : Long =
    q.recentProgress.iterator
      .flatMap(_.stateOperators.iterator)
      .map(_.numRowsDroppedByWatermark).sum

  private[streaming] def step(key: Long, rows: Iterator[TjIn],
      state: GroupState[TjState]): Iterator[Enriched] = {
    val wm = state.getCurrentWatermarkMs()
    val st = state.getOption.getOrElse(TjState(Nil, Nil))
    var versions = st.versions
    var pending = st.pending
    if (!state.hasTimedOut) rows.foreach { r =>
      if (r.kind == 0) versions ::= ((r.et.getTime, r.vm))
      else pending ::= ((r.et.getTime, r.id, r.vm))
    }
    // finalize: every fact at-or-below the watermark has seen every
    // dimension version that could apply to it. Deterministic emit
    // order (ft, id) and deterministic version pick max-(vt, vm) so a
    // replay of the same batch emits identical rows.
    val (ready, hold) = pending.partition(_._1 <= wm)
    val out = ready.sortBy(fct => (fct._1, fct._2)).map {
      case (ft, id, fvm) =>
        val inForce = versions.filter(_._1 <= ft)
        val v = if (inForce.isEmpty) None else Some(inForce.max)
        Enriched(key, id, ft, fvm, v.map(_._1), v.map(_._2))
    }
    // compact: keep versions newer than the watermark plus the single
    // newest at-or-below it (the one still "in force" for future facts)
    val live = versions.filter(_._1 > wm)
    val inForceNow = versions.filter(_._1 <= wm)
    versions = if (inForceNow.isEmpty) live.distinct
      else (inForceNow.max :: live).distinct
    if (hold.isEmpty && versions.isEmpty) state.remove()
    else {
      state.update(TjState(versions, hold))
      // wake this key when the watermark passes its earliest pending
      // fact, so held facts flush without needing new rows for the key
      if (hold.nonEmpty) {
        val t = hold.map(_._1).min + 1
        if (t > wm) state.setTimeoutTimestamp(t)
      }
    }
    out.iterator
  }
}
