package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming set-similarity join (the ICDE'20 "Distributed Streaming
  * Set Similarity Join" shape): a stream of documents is matched
  * against a static indexed corpus by n-gram-shingle Jaccard
  * similarity, end-to-end as ONE continuous query — no foreachBatch
  * re-implementation of the batch operator.
  *
  * Plan shape per micro-batch:
  *   1. shingling is a narrow projection (`array_distinct` before the
  *      explode, so per-doc set semantics never need a shuffle);
  *   2. the candidate join is stream-STATIC on the shingle key —
  *      stateless, no join buffer;
  *   3. the per-(stream doc, corpus doc) overlap count is a windowed
  *      streaming aggregation bounded by the event-time watermark —
  *      append-mode emission once the watermark passes, state size
  *      bounded by in-flight windows only.
  *
  * At 100 TB-corpus scale the static side is the inverted index
  * (shingle -> doc) a real system would pre-bucket on the shingle; a
  * PPJoin-style size prune rides in the join condition exactly like
  * the batch `jaccardPairs`.
  */
object StreamingSimJoin {

  /** `stream`: streaming (idCol, textCol, tsCol) rows. `corpus`: batch
    * documents. Emits (window, s_id, c_id, common, jaccard) pairs with
    * jaccard >= minJ after the watermark passes the doc's window.
    */
  def streamCorpusJoin(stream: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, tsCol: String, minJ: Double,
      n: Int = 3, watermarkDelay: String = "10 minutes",
      windowLen: String = "1 minute"): DataFrame = {
    val cSh = Dedup.shingles(corpus, idCol, textCol, n)
    val cSized = cSh
      .join(cSh.groupBy(col("id")).agg(count(lit(1)).as("c_sz")), "id")
      .select(col("id").as("c_id"), col("shingle"), col("c_sz"))
    val sh = array_distinct(Dedup.shingleArray(col(textCol), n))
    // watermark BEFORE the shingle explode: a document too short to
    // shingle still advances event time (otherwise idle/short tails
    // could stall append-mode emission forever)
    val sSh = stream.withWatermark(tsCol, watermarkDelay)
      .select(col(idCol).as("s_id"), col(tsCol).as("ts"),
        size(sh).as("s_sz"), explode(sh).as("shingle"))
    sSh
      // stream-static equi-join on the shingle; the size prune cuts
      // candidates that cannot reach minJ (exact, never drops a
      // qualifying pair): minJ * max(sz) <= min(sz)
      .join(cSized,
        sSh("shingle") === cSized("shingle") &&
          col("s_sz") * minJ <= col("c_sz") &&
          col("c_sz") * minJ <= col("s_sz"))
      .groupBy(window(col("ts"), windowLen), col("s_id"), col("c_id"),
        col("s_sz"), col("c_sz"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("s_sz") + col("c_sz") - col("common")).cast("double"))
      .filter(col("jaccard") >= minJ)
      .select(col("window"), col("s_id"), col("c_id"), col("common"),
        col("jaccard"))
  }
}
