package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** One (doc, band-bucket) touch: `bucket` is "band|bandSignature". */
case class BucketHit(bucket: String, id: Long, seq: Long, text: String)

/** A verified near-dup collision: `id` arrived while `owner_id` held
  * one of its band buckets and exact Jaccard cleared the threshold.
  */
case class LshCollision(id: Long, band: Int, owner_id: Long,
  jaccard: Double)

/** Streaming MinHash-LSH near-duplicate detection — the ONLINE
  * counterpart of `Dedup.minhashLshPairs`: each band bucket is owned
  * by its first toucher (ValueState, RocksDB-backed); later docs that
  * land in an owned bucket are verified with exact Jaccard against
  * the owner and emitted as collisions when they clear `minJ`. An
  * ingest pipeline drops (or routes) collision ids and keeps owners —
  * first-come-keeps, the semantics an online dedup must have (a batch
  * job over the accumulated corpus can afford global canonical
  * selection; a stream cannot wait for it).
  *
  * Scale shape: the 16-hash signature is a PER-ROW projection
  * (array_min over a transform of the shingle array — no explode, no
  * shuffle); the only shuffle is the groupBy on band buckets, and
  * state is one (owner id, owner text) per TOUCHED bucket. Collision
  * verification is O(|doc|) per colliding pair, never all-pairs.
  * Production would hold a shingle sketch instead of the owner text;
  * the text keeps the verify exact here (reference-style exactness
  * over memory), and TTL can bound bucket lifetime like the batch
  * side's corpus windows.
  */
class LshBucketProcessor(minJ: Double, n: Int, ttlMs: Long = 0L)
    extends StatefulProcessor[String, BucketHit, LshCollision] {

  @transient private var owner: ValueState[(Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    owner = getHandle.getValueState[(Long, String)]("owner",
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING),
      // ttl bounds bucket-owner lifetime (RocksDB native TTL) — the
      // streaming analog of the batch side's corpus windows; 0 keeps
      // owners forever (exact first-come-keeps over the whole stream)
      if (ttlMs > 0) TTLConfig(java.time.Duration.ofMillis(ttlMs))
      else TTLConfig.NONE)

  override def handleInputRows(bucket: String,
      rows: Iterator[BucketHit],
      timerValues: TimerValues): Iterator[LshCollision] = {
    val band = bucket.substring(0, bucket.indexOf('|')).toInt
    // within a micro-batch, arrival (seq) order decides ownership so
    // replays are deterministic
    val sorted = rows.toArray.sortBy(h => (h.seq, h.id))
    var cur = Option(owner.get())
    // the owner's shingle set is constant across this invocation —
    // shingle it once, not once per colliding row
    var ownerShingles: Set[String] =
      cur.map(o => StreamingLshDedup.shingleSet(o._2, n)).orNull
    val out = Array.newBuilder[LshCollision]
    sorted.foreach { h =>
      cur match {
        case None =>
          cur = Some((h.id, h.text))
          ownerShingles = StreamingLshDedup.shingleSet(h.text, n)
          owner.update((h.id, h.text))
        case Some((oid, _)) if oid != h.id =>
          val j = StreamingLshDedup.jaccard(
            StreamingLshDedup.shingleSet(h.text, n), ownerShingles)
          if (j >= minJ) out += LshCollision(h.id, band, oid, j)
        case _ => () // duplicate delivery of the owner itself
      }
    }
    out.result().iterator
  }
}

object StreamingLshDedup {

  /** Driver/executor-side mirror of `Dedup.shingleArray` as a plain
    * Scala set (tokens = trim + split on whitespace, word n-grams).
    */
  def shingleSet(text: String, n: Int = 3): Set[String] = {
    val tk = text.trim.split("\\s+")
    if (tk.length < n) Set.empty
    else (0 to tk.length - n).map(i => tk.slice(i, i + n)
      .mkString(" ")).toSet
  }

  def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size.toDouble

  /** Per-row MinHash band signatures as a pure projection — batch and
    * stream alike, no shuffle: mh_s = lexicographic min of
    * md5("s|" || shingle) over the row's DISTINCT shingles, identical
    * to the batch `Dedup.minhashSignatures` family; one output row
    * per (doc, band) with bucket = "band|mh_a,mh_b,..". Docs with no
    * shingles (shorter than n tokens) produce no rows — same as the
    * batch side, where they never enter the shingle table.
    */
  def bandHits(df: DataFrame, idCol: String, seqCol: String,
      textCol: String, numHashes: Int = 16, bands: Int = 4,
      n: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sh = array_distinct(Dedup.shingleArray(col(textCol), n))
    val mhs = (0 until numHashes).map(s =>
      array_min(transform(col("__sh"), x =>
        md5(concat(lit(s"$s|"), x)))).as(s"mh$s"))
    df.select(col(idCol).cast("long").as("id"),
        col(seqCol).cast("long").as("seq"),
        col(textCol).as("text"), sh.as("__sh"))
      .filter(size(col("__sh")) >= 1)
      .select(col("id") +: col("seq") +: col("text") +: mhs: _*)
      .select(col("id"), col("seq"), col("text"),
        explode(array((0 until bands).map { b =>
          concat(lit(s"$b|"), concat_ws(",",
            (0 until rowsPerBand).map(r =>
              col(s"mh${b * rowsPerBand + r}")): _*))
        }: _*)).as("bucket"))
  }

  /** Wire the stream: (id, seq, text) -> collision rows
    * (id, band, owner_id, jaccard). Consumers keep ids with no
    * collision row and drop/route the rest.
    */
  def collisions(df: DataFrame, idCol: String, seqCol: String,
      textCol: String, minJ: Double, numHashes: Int = 16,
      bands: Int = 4, n: Int = 3, ttlMs: Long = 0L): DataFrame = {
    import df.sparkSession.implicits._
    val hits: Dataset[BucketHit] =
      bandHits(df, idCol, seqCol, textCol, numHashes, bands, n)
        .select(col("bucket"), col("id"), col("seq"), col("text"))
        .as[BucketHit]
    hits.groupByKey(_.bucket)
      .transformWithState(new LshBucketProcessor(minJ, n, ttlMs),
        if (ttlMs > 0) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
      .toDF()
  }
}
