package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 4: the fixed-size mergeable corpus sample.
  *
  *  - `sketch_bottomk_sample`: the bottom-k (min-wise) corpus sample —
  *    the R docs with the smallest deterministic md5 rank. Unlike a
  *    hash-rate split (text_hash_split), the sample size is FIXED at R
  *    whatever the corpus size, and it is MERGEABLE: bottom-k of a
  *    union == bottom-k of the concatenated per-shard bottom-k's (the
  *    KMV identity, proved in the spec) — so a 100 TB corpus sample is
  *    computed shard-local and merged with R rows per shard of traffic.
  *
  * 100 TB shape: a TakeOrderedAndProject (no global sort) over one
  * scan.
  */
object Ext69Queries {

  // ---------------------------------------------------------------
  // sketch_bottomk_sample
  // ---------------------------------------------------------------

  val SampleR = 32

  /** The deterministic min-wise rank: first 15 md5 hex digits (60
    * bits) of "mws:<doc_id>" — BIGINT-safe on both engines.
    */
  def mwRank(id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("mws:"), id.cast("string"))),
      1, 15), 16, 10).cast("long")

  def bottomkSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        mwRank(col("doc_id")).as("h"))
    // sort-limit FIRST (TakeOrderedAndProject — per-partition heaps,
    // no global sort), then rank the R survivors; a global rank window
    // over the corpus would single-partition the whole table
    val top = ranked.orderBy(col("h"), col("doc_id")).limit(SampleR)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("h"), col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "h", "lang", "n_chars")
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_bottomk_sample" -> bottomkSample _,
  )

  val oracle: Map[String, String] = Map(
    "sketch_bottomk_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(('0x' || substr(md5('mws:' || doc_id), 1, 15))
        |      ::UBIGINT AS BIGINT) AS h
        |  FROM documents
        |)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT)
        |    AS rank,
        |  doc_id, h, lang, n_chars
        |FROM ranked
        |ORDER BY h, doc_id
        |LIMIT 32""".stripMargin,
  )
}
