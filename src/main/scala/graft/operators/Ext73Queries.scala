package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 8: the truncation-policy report.
  *
  *  - `tok_truncation_loss`: the OTHER sequence-length policy (the
  *    complement of tok_packing_report's concatenation bins) —
  *    truncate-at-L: per language, docs truncated, tokens lost, and
  *    the lost-token share at L = 64. The table that decides whether
  *    a corpus needs packing or can afford plain truncation.
  *
  * 100 TB shape: one corpus scan collapsed to a |langs|-row lattice
  * with map-side combine; the token counting is size(split(...)),
  * never an explode.
  */
object Ext73Queries {

  private val TruncL = 64L

  // ---------------------------------------------------------------
  // tok_truncation_loss
  // ---------------------------------------------------------------

  def truncationLoss(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = t(spark, dir, "documents")
      .select(col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long")
          .as("n_tokens"))
      .withColumn("lost", greatest(col("n_tokens") - TruncL, lit(0L)))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lost") > 0, 1L).otherwise(0L)).as("n_truncated"),
        sum("n_tokens").as("tok_total"),
        sum("lost").as("tok_lost"))
      .withColumn("loss_micro", expr("tok_lost * 1000000 div tok_total"))
      .select("lang", "n_docs", "n_truncated", "tok_total", "tok_lost",
        "loss_micro")
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tok_truncation_loss" -> truncationLoss _,
  )


  val oracle: Map[String, String] = Map(
    "tok_truncation_loss" ->
      (s"""WITH perdoc AS (
  SELECT lang,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
      AS n_tokens
  FROM documents
), l AS (
  SELECT lang, n_tokens,
    greatest(n_tokens - $TruncL, 0) AS lost
  FROM perdoc
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN lost > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_truncated,
  CAST(SUM(n_tokens) AS BIGINT) AS tok_total,
  CAST(SUM(lost) AS BIGINT) AS tok_lost,
  CAST(SUM(lost) * 1000000 // SUM(n_tokens) AS BIGINT) AS loss_micro
FROM l GROUP BY lang
ORDER BY lang"""),
  )
}
