package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 14: distributed top-k shard merge, CDC transaction
  * boundary assembly, and zero-extra-pass observed metrics.
  *
  *  - `sim_topk_shard_merge`: exact cosine top-k computed the way a
  *    1000-executor cluster computes it — each of 8 corpus shards
  *    ranks its local top-k per query, and the global answer is the
  *    re-rank of the 8k shard survivors. Merge-of-shard-top-k equals
  *    direct top-k exactly (every global winner is a winner in its
  *    own shard), and the DuckDB oracle computes the DIRECT answer,
  *    so the hash gate proves the distributive identity.
  *  - `cdc_txn_assembly`: transaction-boundary apply — changelog
  *    messages carry txid = event_id div 8; messages still in
  *    flight (event_id % 101 == 0) leave their transactions
  *    incomplete, and an atomic consumer must hold back EVERY row of
  *    an incomplete transaction (the reference's topic semantics:
  *    commit boundaries, not message boundaries). Output is the LWW
  *    state over complete transactions only; erase as the last
  *    complete op removes the key.
  *  - `dq_observe_metrics`: `Dataset.observe` / CollectMetrics — the
  *    data-quality counters (row count, value sum/min/max, error-row
  *    count) ride the SAME pass as the main query instead of a
  *    second scan; the operator returns the observed metrics row,
  *    and the oracle recomputes them declaratively, proving the
  *    piggybacked pass loses nothing.
  *
  * 100 TB shapes: the shard merge is the no-global-sort top-k (per
  * executor a WindowGroupLimit over its shard, then one |q|·8k
  * re-rank); txn assembly is one groupBy(txid) completeness check
  * semi-joined back (both sides partition on txid); observe adds an
  * accumulator to an existing scan — zero extra shuffle, zero extra
  * pass.
  */
object Ext51Queries {

  // ---------------------------------------------------------------
  // sim_topk_shard_merge
  // ---------------------------------------------------------------

  private val K = 12

  def topkShardMerge(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 108)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
    val c = emb.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"))
      .withColumn("n_nrm", Similarity.norm(col("n_vec")))
      .withColumn("shard", pmod(col("n_id"), lit(8)))
    val sims = c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("sim", round(
        Similarity.dot(col("q_vec"), col("n_vec"))
          / (col("q_nrm") * col("n_nrm")), 6))
      .select("q_id", "n_id", "shard", "sim")
    val wShard = Window.partitionBy("q_id", "shard")
      .orderBy(col("sim").desc, col("n_id"))
    val survivors = sims
      .withColumn("srk", row_number().over(wShard))
      .filter(col("srk") <= K) // local top-k inside each shard
    val wGlobal = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))
    survivors
      .withColumn("rank", row_number().over(wGlobal))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // cdc_txn_assembly
  // ---------------------------------------------------------------

  def txnAssembly(spark: SparkSession, dir: String): DataFrame = {
    val arrived = CdcQueries.parsedStored(spark, dir)
      .filter(col("event_id") % 101 =!= 0)
      .withColumn("txid", expr("event_id div 8"))
    val complete = arrived.groupBy("txid")
      .agg(count(lit(1)).as("n_ops"))
      .filter(col("n_ops") === 8)
      .select("txid")
    val applied = arrived
      .join(complete, "txid")
      .filter(col("op").isin("update", "update_newimage", "erase"))
    val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    applied.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "erase")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type"), col("value_milli"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------
  // dq_observe_metrics
  // ---------------------------------------------------------------

  def observeMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(col("event_type"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
    val obs = Observation()
    val named = ev.observe(obs,
      count(lit(1)).as("n_rows"),
      sum("vm").as("s_milli"),
      min("vm").as("min_milli"),
      max("vm").as("max_milli"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L))
        .as("n_error"))
    // the "main" job the metrics piggyback on — one pass, no second
    // scan for the counters
    named.write.mode("overwrite").format("noop").save()
    val m = obs.get
    import spark.implicits._
    Seq((m("n_rows").asInstanceOf[Long], m("s_milli").asInstanceOf[Long],
      m("min_milli").asInstanceOf[Long], m("max_milli").asInstanceOf[Long],
      m("n_error").asInstanceOf[Long]))
      .toDF("n_rows", "s_milli", "min_milli", "max_milli", "n_error")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_shard_merge" -> topkShardMerge _,
    "cdc_txn_assembly" -> txnAssembly _,
    "dq_observe_metrics" -> observeMetrics _,
  )

  val oracle: Map[String, String] = Map(
    // the DIRECT top-k — hash equality proves shard-merge == direct
    "sim_topk_shard_merge" ->
      """WITH qe AS (
        |  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id >= 100 AND vec_id < 108
        |), ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT qe.q_id, ee.vec_id, SUM(qe.x * ee.x) AS dot
        |  FROM qe JOIN ee ON qe.i = ee.i AND qe.q_id <> ee.vec_id
        |  GROUP BY qe.q_id, ee.vec_id
        |), sims AS (
        |  SELECT d.q_id, d.vec_id AS n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, n_id) AS rank
        |  FROM sims)
        |SELECT q_id, n_id, sim, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 12 ORDER BY q_id, rank""".stripMargin,
    "cdc_txn_assembly" -> (CdcQueries.baseCtePublic +
      """, arrived AS (
        |  SELECT *, event_id // 8 AS txid FROM typed
        |  WHERE event_id % 101 <> 0
        |), complete AS (
        |  SELECT txid FROM arrived GROUP BY txid HAVING count(*) = 8
        |), applied AS (
        |  SELECT a.* FROM arrived a JOIN complete c ON c.txid = a.txid
        |  WHERE a.op IN ('update', 'update_newimage', 'erase')
        |), lww AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn
        |  FROM applied)
        |SELECT user_id, event_id AS last_event_id, event_type,
        |  value_milli
        |FROM lww WHERE rn = 1 AND op <> 'erase'
        |ORDER BY user_id""".stripMargin),
    "dq_observe_metrics" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS s_milli,
        |  CAST(min(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS min_milli,
        |  CAST(max(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS max_milli,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error
        |FROM events""".stripMargin,
  )
}
