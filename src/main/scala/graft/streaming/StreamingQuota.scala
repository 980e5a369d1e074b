package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Admitted row: the key it charged quota against and its id. */
case class Admitted(key: String, id: Long)

/** Streaming per-key admission quota: at most `cap` rows per key pass,
  * ever — the streaming counterpart of `TextAnalysis.sourceCap` (the
  * batch per-source contribution bound) for an ingest pipeline that
  * must cut a source off the moment it exhausts its budget instead of
  * waiting for a batch job over the accumulated corpus.
  *
  * Scale/ordering contract: state is ONE counter per key (ValueState,
  * RocksDB-backed, optional TTL for expiring budgets); rows shuffle
  * to their key's partition, and within a micro-batch admission is by
  * ascending id so replays are deterministic; across micro-batches,
  * arrival order governs — exactly the semantics a quota should have
  * on a stream (first-come-first-admitted, not hash-lottery like the
  * batch sampler, which can afford global knowledge).
  */
class QuotaProcessor(cap: Long)
    extends StatefulProcessor[String, (String, Long), Admitted] {

  @transient private var taken: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    taken = getHandle.getValueState[Long]("taken",
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[Admitted] = {
    val have = Option(taken.get()).getOrElse(0L)
    if (have >= cap) return Iterator.empty
    // clamp before toInt: a cap beyond Int.MaxValue would wrap
    // negative and admit nothing
    val admitted = rows.map(_._2).toArray.sorted
      .take(math.min(cap - have, Int.MaxValue.toLong).toInt)
    taken.update(have + admitted.length)
    admitted.iterator.map(Admitted(key, _))
  }
}

object StreamingQuota {

  /** Cap `df` (streaming) to `cap` rows per `keyCol`; emits
    * (key, id) of the admitted rows.
    */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String,
      cap: Long): Dataset[Admitted] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string"), col(idCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new QuotaProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
