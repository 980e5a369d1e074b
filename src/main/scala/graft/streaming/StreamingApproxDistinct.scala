package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** One estimate row per touched group per micro-batch. `batch` is the
  * group's micro-batch sequence number — consumers take the max-batch
  * row per group as the current estimate.
  */
case class ADEntry(group: String, batch: Long, estimate: Long,
  nonZero: Int)

/** Streaming approximate COUNT(DISTINCT) per group — HyperLogLog
  * (Flajolet et al., AofA '07) registers in `transformWithState`
  * ValueState: the streaming analog of the batch
  * `approx_count_distinct` (q23) with O(2^p) state per group,
  * independent of stream length or item cardinality.
  *
  * Register updates use the md5 of the item (the repo-wide portable
  * hash): index = top p bits, rank = leading-zero count of the
  * remaining 64-p bits + 1. Registers only ever grow (max), so the
  * operator is idempotent under replay — reprocessing a micro-batch
  * after a crash cannot inflate the estimate, which is exactly the
  * at-least-once guarantee the CDC pipeline needs from a metrics
  * side-channel.
  *
  * Scale shape: state per group is a fixed 2^p-byte array; groups
  * shard across the stateful stage's partitions; emitted rows are one
  * per touched group per batch. No shuffle beyond the groupByKey that
  * any per-group stateful op requires.
  */
class HllProcessor(p: Int)
    extends StatefulProcessor[String, (String, String), ADEntry] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")

  private val m = 1 << p

  @transient private var regs: ValueState[Array[Byte]] = _
  @transient private var batchSeq: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    regs = getHandle.getValueState[Array[Byte]]("hll",
      Encoders.BINARY, TTLConfig.NONE)
    batchSeq = getHandle.getValueState[Long]("bseq",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String,
      rows: Iterator[(String, String)],
      timerValues: TimerValues): Iterator[ADEntry] = {
    val r = Option(regs.get()).getOrElse(new Array[Byte](m))
    rows.foreach { case (_, item) => HllSketch.update(r, p, item) }
    regs.update(r)
    val b = Option(batchSeq.get()).getOrElse(0L) + 1
    batchSeq.update(b)
    Iterator.single(ADEntry(key, b, HllSketch.estimate(r, p),
      r.count(_ != 0)))
  }
}

/** The register arithmetic, shared by the operator and its
  * differential spec's driver-side replay.
  */
object HllSketch {

  /** 64-bit value from the first 16 md5 hex chars of the item. */
  def hash64(item: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def update(regs: Array[Byte], p: Int, item: String): Unit = {
    val h = hash64(item)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p // remaining 64-p bits, top-aligned
    val rank = (if (w == 0) 64 - p else
      java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  /** Classic HLL estimator with the small-range (linear counting)
    * correction — deterministic double arithmetic, same on every
    * replay.
    */
  def estimate(regs: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }
}

object StreamingApproxDistinct {

  /** Per-group approximate distinct counts over (group, item) rows.
    * Each micro-batch re-emits the touched groups' current estimate
    * (Update mode).
    */
  def approxDistinct(events: Dataset[(String, String)], p: Int)
      : Dataset[ADEntry] = {
    implicit val outEnc: Encoder[ADEntry] = Encoders.product[ADEntry]
    events.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new HllProcessor(p), TimeMode.None(),
        OutputMode.Update())
  }
}
