package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 batch: the agreement-kit closer.
  *
  *  - `eval_cochran_q`: Cochran's Q — the k-judge PAIRED binary
  *    agreement test the krippendorff/fleiss family still lacked.
  *    Fleiss' kappa measures HOW MUCH the judges agree; Cochran's Q
  *    tests whether the judges have the SAME marginal pass rate on
  *    the same documents (the null an LLM-judge ensemble audit
  *    actually cares about: is judge 2 systematically stricter?).
  *    Runs over the identical three-judge panel as
  *    `eval_fleiss_kappa` (Ext84Queries.judgeVotes) so the two
  *    statistics read the same ballots.
  */
object Ext88Queries {

  // ---------------------------------------------------------------
  // eval_cochran_q
  // ---------------------------------------------------------------

  /** Cochran's Q for k = 3 binary raters:
    *
    *   Q = (k−1)·(k·ΣⱼGⱼ² − N²) / (k·N − ΣᵢLᵢ²)
    *
    * with Gⱼ = judge j's pass count, Lᵢ = row (document) vote total,
    * N = ΣGⱼ = ΣLᵢ. Under H₀ (equal judge marginals) Q ~ χ²(k−1);
    * `q_flag` marks the 5% critical point for df = 2 (5.991).
    * The denominator has a closed per-item form: 3L − L² is 0 for
    * unanimous items (L ∈ {0,3}) and 2 for splits (L ∈ {1,2}), so
    * k·N − ΣL² = 2·n_splits exactly — Q is driven ONLY by items the
    * judges disagree on, which is why `n_splits` is surfaced.
    *
    * Parity/overflow discipline: the corpus collapses to ONE row of
    * exact BIGINT moments (counts, three judge totals, ΣL, ΣL²); the
    * statistic itself is SCALAR double arithmetic on those integers
    * — no double ever enters a SUM, so there is no summation-order
    * hazard (the ev_srm chi² pattern, Ext87Queries.scala), and
    * squaring in doubles instead of BIGINT avoids the Gⱼ² overflow
    * that capped the earlier exact-integer fleiss form (round-9
    * ADVICE lesson): valid to any corpus size at test-statistic
    * precision.
    *
    * 100 TB shape: one corpus pass (the tokenizer shared with the
    * fleiss entry) into a 1-row moment aggregate; Q is arithmetic on
    * that row.
    */
  def cochranQ(spark: SparkSession, dir: String): DataFrame =
    Ext84Queries.judgeVotes(spark, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum("j1").as("g1"), sum("j2").as("g2"), sum("j3").as("g3"),
        sum("n1").as("nn"), sum(expr("n1 * n1")).as("b"))
      .withColumn("n_splits", expr("(3 * nn - b) div 2"))
      .withColumn("q_micro", expr(
        "cast(round(2.0d * (3.0d * (cast(g1 as double) * cast(g1 as double)" +
          " + cast(g2 as double) * cast(g2 as double)" +
          " + cast(g3 as double) * cast(g3 as double))" +
          " - cast(nn as double) * cast(nn as double))" +
          " / cast(greatest(3 * nn - b, 1) as double) * 1e6) as bigint)"))
      .withColumn("q_flag", (col("q_micro") > 5991000L).cast("int"))
      .select("n_docs", "g1", "g2", "g3", "n_splits", "q_micro",
        "q_flag")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_cochran_q" -> cochranQ _)

  val oracle: Map[String, String] = Map(
    "eval_cochran_q" ->
      """WITH v AS (
        |  SELECT n_chars,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents
        |), j AS (
        |  SELECT
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS j1,
        |    CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
        |      THEN 1 ELSE 0 END AS j2,
        |    CASE WHEN len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','in','to','is'], x))) >= 2
        |      THEN 1 ELSE 0 END AS j3
        |  FROM v
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(j1) AS BIGINT) AS g1,
        |    CAST(SUM(j2) AS BIGINT) AS g2,
        |    CAST(SUM(j3) AS BIGINT) AS g3,
        |    CAST(SUM(j1 + j2 + j3) AS BIGINT) AS nn,
        |    CAST(SUM((j1 + j2 + j3) * (j1 + j2 + j3)) AS BIGINT) AS b
        |  FROM j)
        |SELECT n_docs, g1, g2, g3,
        |  (3 * nn - b) // 2 AS n_splits,
        |  CAST(ROUND(2.0 * (3.0 * (CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
        |    + CAST(g2 AS DOUBLE) * CAST(g2 AS DOUBLE)
        |    + CAST(g3 AS DOUBLE) * CAST(g3 AS DOUBLE))
        |    - CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
        |    / CAST(GREATEST(3 * nn - b, 1) AS DOUBLE) * 1e6) AS BIGINT)
        |    AS q_micro,
        |  CAST(CASE WHEN CAST(ROUND(2.0 * (3.0
        |    * (CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
        |    + CAST(g2 AS DOUBLE) * CAST(g2 AS DOUBLE)
        |    + CAST(g3 AS DOUBLE) * CAST(g3 AS DOUBLE))
        |    - CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
        |    / CAST(GREATEST(3 * nn - b, 1) AS DOUBLE) * 1e6) AS BIGINT)
        |    > 5991000 THEN 1 ELSE 0 END AS INT) AS q_flag
        |FROM m""".stripMargin)
}
