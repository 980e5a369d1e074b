package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 5: corpus mixing weights and the pass@k estimator.
  *
  *  - `pipeline_mix_weights`: dataset-mixture reweighting — per
  *    language, the downsample weight that moves the observed mix to
  *    the uniform target (weight = target share / actual share, capped
  *    at 1 so the mix is reached by downsampling alone, never by
  *    duplication), plus the expected post-sampling count. The knob
  *    every pretraining data recipe turns; here exact in integer
  *    micro.
  *  - `eval_pass_at_k`: the unbiased pass@k estimator
  *    1 − C(n−c, k)/C(n, k) per task for k = 1..5, on n = the task's
  *    first ≤32 attempts (attempts = the user's purchase events in
  *    (ts, event_id) order; pass = value above the global fixture
  *    median). Capping n at 32 is both the standard protocol (pass@k
  *    is estimated from a FIXED sample budget) and what keeps the
  *    falling-factorial products in BIGINT (32^5 ≈ 3.4e7) at any
  *    corpus size. Emitted as micro with floor division, one row per
  *    (task, k ≤ n).
  *
  * 100 TB shapes: mix weights are one groupBy to |langs| cells plus a
  * 1-row totals broadcast; pass@k is one per-task window to pick the
  * 32-attempt head (shuffle on task key), one aggregate to (n, c), and
  * a bounded ×5 k-spine explode over |tasks| rows.
  */
object Ext70Queries {

  // ---------------------------------------------------------------
  // pipeline_mix_weights
  // ---------------------------------------------------------------

  def mixWeights(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "documents")
      .groupBy("lang").agg(count(lit(1)).as("cnt"))
    val totals = broadcast(counts.agg(sum("cnt").as("total"),
      count(lit(1)).as("n_langs")))
    counts.crossJoin(totals)
      .withColumn("actual_micro", expr("cnt * 1000000 div total"))
      .withColumn("target_micro", expr("1000000 div n_langs"))
      // target/actual as a single floor division (no compounding)
      .withColumn("weight_micro",
        least(lit(1000000L), expr("total * 1000000 div (n_langs * cnt)")))
      .withColumn("kept", expr("cnt * weight_micro div 1000000"))
      .select("lang", "cnt", "actual_micro", "target_micro",
        "weight_micro", "kept")
      .orderBy("lang")
  }

  // ---------------------------------------------------------------
  // eval_pass_at_k
  // ---------------------------------------------------------------

  private val MaxN = 32
  private val PassThresholdMilli = 35000L

  def passAtK(spark: SparkSession, dir: String): DataFrame = {
    val att = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("task"), col("ts"), col("event_id"),
        expr(s"cast(round(value * 1000) as bigint)").as("vm"))
    val w = Window.partitionBy("task").orderBy(col("ts"),
      col("event_id"))
    val head = att.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= MaxN)
    val nc = head.groupBy("task")
      .agg(count(lit(1)).as("n"),
        sum(when(col("vm") > PassThresholdMilli, 1L).otherwise(0L))
          .as("c"))
    // per-k falling-factorial legs: k is a literal in each leg, so the
    // product is a plain closed-form expression; n <= 32 keeps every
    // intermediate in BIGINT
    val legs = (1 to 5).map { k =>
      val num = (0 until k)
        .map(j => s"(n - c - $j)").mkString(" * ")
      val den = (0 until k)
        .map(j => s"(n - $j)").mkString(" * ")
      nc.filter(col("n") >= k)
        .withColumn("k", lit(k.toLong))
        .withColumn("pass_micro",
          when(col("c") >= col("n"), lit(1000000L))
            .otherwise(when(col("n") - col("c") < k, lit(1000000L))
              .otherwise(expr(
                s"1000000 - (($num) * 1000000 div ($den))"))))
    }
    legs.reduce(_.unionByName(_))
      .select("task", "n", "c", "k", "pass_micro")
      .orderBy("task", "k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_mix_weights" -> mixWeights _,
    "eval_pass_at_k" -> passAtK _,
  )

  private def passLegSql(k: Int): String = {
    val num = (0 until k).map(j => s"(n - c - $j)").mkString(" * ")
    val den = (0 until k).map(j => s"(n - $j)").mkString(" * ")
    s"""SELECT task, n, c, CAST($k AS BIGINT) AS k,
  CAST(CASE WHEN c >= n THEN 1000000
    WHEN n - c < $k THEN 1000000
    ELSE 1000000 - (($num) * 1000000 // ($den)) END AS BIGINT)
    AS pass_micro
FROM nc WHERE n >= $k"""
  }

  val oracle: Map[String, String] = Map(
    "pipeline_mix_weights" ->
      """WITH counts AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1
        |), totals AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_langs
        |  FROM counts
        |)
        |SELECT lang, cnt,
        |  CAST(cnt * 1000000 // total AS BIGINT) AS actual_micro,
        |  CAST(1000000 // n_langs AS BIGINT) AS target_micro,
        |  CAST(least(1000000,
        |    total * 1000000 // (n_langs * cnt)) AS BIGINT)
        |    AS weight_micro,
        |  CAST(cnt * least(1000000,
        |    total * 1000000 // (n_langs * cnt)) // 1000000 AS BIGINT)
        |    AS kept
        |FROM counts CROSS JOIN totals
        |ORDER BY lang""".stripMargin,
    "eval_pass_at_k" ->
      (s"""WITH att AS (
  SELECT user_id AS task, ts, event_id,
    CAST(round(value * 1000) AS BIGINT) AS vm,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS rn
  FROM events WHERE event_type = 'purchase'
), nc AS (
  SELECT task, CAST(count(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN vm > $PassThresholdMilli THEN 1 ELSE 0 END)
      AS BIGINT) AS c
  FROM att WHERE rn <= $MaxN GROUP BY task
)
""" + (1 to 5).map(passLegSql).mkString("", "\nUNION ALL\n", "") +
        "\nORDER BY task, k"),
  )
}
