package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel maintenance: the batch `ev_funnel` stage query
  * (first view → first qualifying click → first qualifying purchase
  * per user) as an incremental per-key state machine, so the funnel
  * report is continuously current instead of nightly.
  *
  * State per user is THREE timestamps — constant, independent of
  * event volume, the whole point of running the funnel as a machine
  * instead of re-aggregating history. Each update that CHANGES the
  * user's funnel row emits the refreshed row (update-mode contract:
  * the latest emission per user is the current funnel state, and a
  * keyed upsert sink — `KeyedTableSink` here — materializes exactly
  * the batch query's output).
  *
  * The machine is monotone (timestamps only ever fill earlier-stage
  * slots with MINIMUM qualifying times), so replayed deliveries are
  * naturally idempotent — no seq guard needed, unlike SCD2 where
  * emission is the irreversible act.
  *
  * DELIVERY CONTRACT (cross-batch ordering): within one micro-batch,
  * events are sorted by (event time, stage priority, id), so
  * any-order delivery INSIDE a batch is handled. ACROSS batches the
  * machine assumes per-key event-time-ordered delivery — the same
  * per-key ordering guard StreamingScd2 documents for its seq gate.
  * A qualifying click delivered in an EARLIER batch than its
  * prerequisite view is dropped (tView unset at evaluation time) and
  * is not reconsidered when the view arrives, so under cross-batch
  * event-time disorder the streamed funnel can diverge from the
  * batch `ev_funnel` until the affected stages are replayed. This is
  * the standard contract for a keyed CDC/topic source (per-key
  * partition order == event order); feeding the funnel from a source
  * that reorders a key's events across batches requires either
  * replaying the disordered span or buffering out-of-band events in
  * state until their prerequisite stage fills.
  */
object StreamingFunnel {

  /** public: generated row encoders must be able to access these */
  case class FunnelEvent(user_id: Long, event_type: String, us: Long,
      event_id: Long)

  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long) {
    def stage: Int =
      if (tPurchase != Long.MinValue) 3
      else if (tClick != Long.MinValue) 2
      else if (tView != Long.MinValue) 1
      else 0
  }

  case class FunnelRow(user_id: Long, t_view: Long, t_click: Long,
      t_purchase: Long, stage: Int)

  private val Unset = Long.MinValue

  /** `df` columns: user_id, event_type, us (event-time micros),
    * event_id. Returns the stream of refreshed funnel rows (update
    * semantics — latest per user wins downstream).
    */
  def funnelRows(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    val keyed: Dataset[FunnelEvent] = df
      .select(col("user_id").cast("long"), col("event_type"),
        col("us").cast("long"), col("event_id").cast("long"))
      .as[FunnelEvent]
    keyed.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) =>
          var st = state.getOption
            .getOrElse(FunnelState(Unset, Unset, Unset))
          val before = st
          // views before clicks before purchases at EQUAL timestamps:
          // the batch query qualifies a click at us == t_view (>=),
          // so the machine must see the view first
          def prio(t: String): Int = t match {
            case "view" => 0; case "click" => 1; case "purchase" => 2
            case _ => 3
          }
          rows.toSeq.sortBy(e => (e.us, prio(e.event_type), e.event_id))
            .foreach { e =>
            e.event_type match {
              case "view" if st.tView == Unset || e.us < st.tView =>
                // an earlier view can only arrive via replay within a
                // batch; later-stage slots stay (monotone machine)
                st = st.copy(tView = e.us)
              case "click" if st.tView != Unset && e.us >= st.tView &&
                  (st.tClick == Unset || e.us < st.tClick) =>
                st = st.copy(tClick = e.us)
              case "purchase" if st.tClick != Unset &&
                  e.us >= st.tClick &&
                  (st.tPurchase == Unset || e.us < st.tPurchase) =>
                st = st.copy(tPurchase = e.us)
              case _ => ()
            }
          }
          if (st != before) {
            state.update(st)
            Iterator.single(FunnelRow(uid, st.tView,
              if (st.tClick == Unset) -1L else st.tClick,
              if (st.tPurchase == Unset) -1L else st.tPurchase,
              st.stage))
          } else Iterator.empty
      }
      .toDF()
  }
}
