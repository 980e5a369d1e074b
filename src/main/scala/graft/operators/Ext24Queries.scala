package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 10: sequence-model evaluation and LSH index health.
  *
  *  - `eval_markov_acc`: next-event-type prediction backtest — fit
  *    the first-order transition argmax on a TEMPORAL train split
  *    (days 0–19), score top-1 accuracy on the held-out tail. The
  *    honest evaluation discipline (`ts_backtest_snaive`'s) applied
  *    to the `ev_markov_transitions` model; test states unseen in
  *    training predict nothing and score as misses.
  *  - `sim_bucket_stats`: SRP bucket occupancy histogram for the
  *    production LSH index (`sim_ann_lsh`'s planes=6 setting) —
  *    bucket-size distribution and the candidate-pair mass
  *    Σ buckets·C(sz,2) per size, the number that IS the index's
  *    query cost. The tuning companion to `eval_ann_recall`: recall
  *    tells you if planes are too many, this tells you if they are
  *    too few.
  *
  * 100 TB shapes: the backtest collapses the corpus to |types|²
  * transition counts (one user-keyed lead window + one aggregate) and
  * every later step runs on that bounded lattice; bucket stats are
  * one narrow bucket projection + two |buckets|-bounded aggregates.
  */
object Ext24Queries {

  // ---------------------------------------------------------------
  // eval_markov_acc
  // ---------------------------------------------------------------

  private val TrainDays = 20L

  def markovAcc(spark: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"))
      .withColumn("nxt", lead("cur", 1).over(wSeq))
      .filter(col("nxt").isNotNull)
    val train = pairs.filter(col("day") < TrainDays)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    val wArg = Window.partitionBy("cur")
      .orderBy(col("n").desc, col("nxt"))
    val pred = train.withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("cur"), col("nxt").as("pred"))
    pairs.filter(col("day") >= TrainDays)
      .join(broadcast(pred), Seq("cur"), "left")
      .groupBy("cur")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nxt") === col("pred"), 1L).otherwise(0L))
          .as("n_correct"),
        max("pred").as("predicted"))
      .withColumn("acc_micro", expr("n_correct * 1000000 div n_test"))
      .orderBy("cur")
  }

  // ---------------------------------------------------------------
  // sim_bucket_stats
  // ---------------------------------------------------------------

  def bucketStats(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "embeddings")
      .select(col("vec_id"),
        Similarity.srpBucket(col("embedding"), planes = 6, dims = 64)
          .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("n_buckets"))
      .withColumn("n_vectors", col("sz") * col("n_buckets"))
      .withColumn("pair_candidates",
        expr("n_buckets * (sz * (sz - 1) div 2)"))
      .orderBy("sz")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_markov_acc" -> markovAcc _,
    "sim_bucket_stats" -> bucketStats _,
  )

  def oracle: Map[String, String] = Map(
    "eval_markov_acc" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tu,
        |    event_type AS cur,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day
        |  FROM events
        |), pairs AS (
        |  SELECT user_id, day, cur,
        |    lead(cur) OVER (PARTITION BY user_id
        |      ORDER BY tu, event_id) AS nxt
        |  FROM e
        |), pp AS (SELECT * FROM pairs WHERE nxt IS NOT NULL),
        |train AS (
        |  SELECT cur, nxt, COUNT(*) AS n FROM pp
        |  WHERE day < $TrainDays GROUP BY cur, nxt
        |), pred AS (
        |  SELECT cur, nxt AS pred FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cur
        |      ORDER BY n DESC, nxt) AS rn
        |    FROM train) x
        |  WHERE rn = 1)
        |SELECT t.cur, CAST(COUNT(*) AS BIGINT) AS n_test,
        |  CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  MAX(p.pred) AS predicted,
        |  (CAST(SUM(CASE WHEN t.nxt = p.pred THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT)
        |    AS acc_micro
        |FROM pp t LEFT JOIN pred p ON p.cur = t.cur
        |WHERE t.day >= $TrainDays
        |GROUP BY t.cur
        |ORDER BY t.cur""".stripMargin,
    "sim_bucket_stats" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), contrib AS (
        |  SELECT vec_id, p,
        |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
        |      AS c
        |  FROM ee, UNNEST(range(0, 6)) AS pl(p)
        |  GROUP BY vec_id, p
        |), buckets AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY p) AS bucket
        |  FROM contrib GROUP BY vec_id
        |), occ AS (
        |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM buckets GROUP BY bucket)
        |SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_buckets,
        |  sz * CAST(COUNT(*) AS BIGINT) AS n_vectors,
        |  CAST(COUNT(*) AS BIGINT) * ((sz * (sz - 1)) // 2)
        |    AS pair_candidates
        |FROM occ GROUP BY sz
        |ORDER BY sz""".stripMargin,
  )
}
