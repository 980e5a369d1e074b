package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 3: scalar-quantized ANN, its recall audit, and the
  * CDC backfill planner.
  *
  *  - `sim_ann_sq8`: scalar quantization (SQ8) vector search — the
  *    third classic ANN compression next to the repo's IVF and PQ:
  *    global per-corpus [min,max] bounds, each float mapped to one
  *    byte (0..255), candidate generation by exact INTEGER dot
  *    product over codes (codegen-friendly, no floats in the scan),
  *    then exact float cosine re-rank of the top candidates.
  *  - `eval_recall_curve`: recall@{1,5,10} of the SQ8 integer-code
  *    ranking against exact-cosine ground truth, averaged over the
  *    query set — the accuracy/compression audit for the operator
  *    above (completes the eval_{ann,ivf}_recall family with a
  *    multi-k curve in ONE pass).
  *  - `cdc_backfill_plan`: equal-row key-range chunking of a keyed
  *    table (ntile over the PK) — the planner a CDC operator runs
  *    before a snapshot backfill so every chunk is a bounded,
  *    restartable scan (the chunked-snapshot pattern of
  *    Debezium-style incremental snapshots; reference has no native
  *    analog — its snapshot story is delegated).
  *
  * Exactness: quantization bounds are min/max (order-independent);
  * codes and code dot products are exact integers; only the re-rank
  * cosine goes through doubles, rounded to the 1e-6 lattice with
  * identical expression text (the sim_cosine_topk precedent).
  *
  * 100 TB shapes: SQ8 cuts the scanned bytes 4× and the candidate
  * scan is a broadcast-queries × corpus narrow map (int MACs) — the
  * same shape ADC scoring has in sim_ann_pq; the recall curve only
  * ever ranks the tiny query-set neighborhoods; the backfill planner
  * is a single pass + an ntile on the (already tiny) chunk-boundary
  * table — at scale the same plan runs on a range-sampled sketch.
  */
object Ext29Queries {

  private val nQueries = 8
  private val kCand = 10

  /** (vec_id, codes array<int>, norm-ready raw array) with global
    * SQ8 bounds attached in-plan (1-row broadcast).
    */
  private def quantized(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val bounds = broadcast(emb.agg(
      min(array_min(col("embedding"))).cast("double").as("mn"),
      max(array_max(col("embedding"))).cast("double").as("mx")))
    // greatest(mx-mn, tiny): a degenerate corpus (all values equal)
    // must quantize to code 0, not NaN->null (ADVICE r5)
    emb.crossJoin(bounds)
      .select(col("vec_id"), col("embedding"), col("mn"), col("mx"),
        transform(col("embedding"), x =>
          round((x.cast("double") - col("mn"))
            / greatest(col("mx") - col("mn"), lit(1e-300)) * 255)
            .cast("int"))
          .as("codes"))
  }

  // ---------------------------------------------------------------
  // sim_ann_sq8
  // ---------------------------------------------------------------

  def annSq8(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val queries = broadcast(q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("codes").as("q_codes"),
        col("embedding").as("q_emb")))
    val corpus = q.select(col("vec_id").as("n_id"), col("codes"),
      col("embedding").as("n_emb"))
    // integer code dot product — exact in any engine
    val scored = queries.join(corpus, col("q_id") =!= col("n_id"))
      .withColumn("iscore",
        aggregate(zip_with(col("q_codes"), col("codes"),
          (a, b) => (a * b).cast("long")), lit(0L), (acc, v) => acc + v))
    val wCand = Window.partitionBy("q_id")
      .orderBy(col("iscore").desc, col("n_id"))
    scored
      .withColumn("crk", row_number().over(wCand))
      .filter(col("crk") <= kCand)
      // exact re-rank of the bounded candidate set
      .withColumn("dot",
        aggregate(zip_with(col("q_emb"), col("n_emb"),
          (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0d), (acc, v) => acc + v))
      .withColumn("nq", sqrt(aggregate(transform(col("q_emb"),
        x => x.cast("double") * x.cast("double")), lit(0.0d),
        (acc, v) => acc + v)))
      .withColumn("nn", sqrt(aggregate(transform(col("n_emb"),
        x => x.cast("double") * x.cast("double")), lit(0.0d),
        (acc, v) => acc + v)))
      .withColumn("cos_r6", round(col("dot") / (col("nq") * col("nn")), 6))
      .withColumn("rank", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("cos_r6").desc, col("n_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("int").as("rank"),
        col("n_id"), col("cos_r6"), col("iscore"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // eval_recall_curve
  // ---------------------------------------------------------------

  /** Recall@k for k in {1,5,10}: SQ8 integer-code ranking (approx)
    * vs exact-cosine ranking (truth), tie-broken identically, mean
    * over the query set on the micro lattice.
    */
  def recallCurve(spark: SparkSession, dir: String): DataFrame = {
    val q = quantized(spark, dir)
    val queries = broadcast(q.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("codes").as("q_codes"),
        col("embedding").as("q_emb")))
    val corpus = q.select(col("vec_id").as("n_id"), col("codes"),
      col("embedding").as("n_emb"))
    val scored = queries.join(corpus, col("q_id") =!= col("n_id"))
      .withColumn("iscore",
        aggregate(zip_with(col("q_codes"), col("codes"),
          (a, b) => (a * b).cast("long")), lit(0L), (acc, v) => acc + v))
      .withColumn("dot",
        aggregate(zip_with(col("q_emb"), col("n_emb"),
          (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0d), (acc, v) => acc + v))
      .withColumn("nn", sqrt(aggregate(transform(col("n_emb"),
        x => x.cast("double") * x.cast("double")), lit(0.0d),
        (acc, v) => acc + v)))
      // query norm is constant per q_id — dot/nn orders identically
      .withColumn("cos_r6", round(col("dot") / col("nn"), 6))
      .withColumn("ark", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("iscore").desc, col("n_id"))))
      .withColumn("trk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("cos_r6").desc, col("n_id"))))
    val ks = Seq(1, 5, 10)
    val hitCols = ks.map(k =>
      sum(when(col("ark") <= k && col("trk") <= k, 1L).otherwise(0L))
        .as(s"hit$k"))
    val perQ = scored.groupBy("q_id")
      .agg(hitCols.head, hitCols.tail: _*)
    val sumCols = ks.map(k => sum(col(s"hit$k")).as(s"hits$k"))
    perQ.agg(count(lit(1)).as("n_queries"), sumCols: _*)
      .select(
        lit(nQueries).cast("long").as("n_queries") +: ks.map(k =>
          expr(s"hits$k * 1000000 div (n_queries * $k)")
            .as(s"recall_at_${k}_micro")): _*)
  }

  // ---------------------------------------------------------------
  // cdc_backfill_plan
  // ---------------------------------------------------------------

  /** Equal-row chunk plan over the orders PK: 16 ntile chunks with
    * contiguous, non-overlapping key ranges, per-chunk row counts
    * and a bytes-proxy budget (the planner's admission input). At
    * 100 TB the identical plan runs over a reservoir/range sample;
    * the chunk table is what the backfill executor iterates,
    * committing a watermark key per finished chunk (restartable,
    * the O10 at-least-once analog for snapshots).
    */
  def backfillPlan(spark: SparkSession, dir: String): DataFrame = {
    val chunks = 16
    val rows = t(spark, dir, "orders")
      .select(col("o_orderkey"),
        (length(col("o_orderpriority")) + length(col("o_orderstatus"))
          + lit(24)).cast("long").as("bytes_est"))
    // ntile over the whole PK was a single-partition window (r7
    // verdict ask #4) — DistRank ranks the corpus fully parallel and
    // the exact NTILE formula reproduces it bit-identically (the
    // DuckDB oracle keeps plain NTILE); 1-row count broadcast
    val n = rows.agg(count(lit(1)).as("_n_rows"))
    DistRank.globalRowNumber(rows, "_rn", 32, col("o_orderkey"))
      .crossJoin(broadcast(n))
      .withColumn("chunk",
        DistRank.ntileFromRowNumber(col("_rn"), col("_n_rows"), chunks)
          .cast("int"))
      .groupBy("chunk")
      .agg(count(lit(1)).as("n_rows"),
        min("o_orderkey").as("key_lo"),
        max("o_orderkey").as("key_hi"),
        sum("bytes_est").as("bytes_est"))
      .select(col("chunk").cast("long").as("chunk"), col("n_rows"),
        col("key_lo"), col("key_hi"), col("bytes_est"))
      .orderBy("chunk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_sq8" -> annSq8 _,
    "eval_recall_curve" -> recallCurve _,
    "cdc_backfill_plan" -> backfillPlan _,
  )

  /** Shared oracle CTE text for the SQ8 code table. */
  private val sqBase =
    """WITH b AS (
      |  SELECT min(list_min(embedding)) AS fmn, max(list_max(embedding)) AS fmx
      |  FROM embeddings
      |), bd AS (
      |  SELECT CAST(fmn AS DOUBLE) AS mn, CAST(fmx AS DOUBLE) AS mx FROM b
      |), ee AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), codes AS (
      |  SELECT vec_id, i, x,
      |    CAST(round((x - mn) / greatest(mx - mn, 1e-300) * 255)
      |      AS BIGINT) AS c
      |  FROM ee, bd
      |), nrm AS (
      |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ee GROUP BY vec_id
      |), pairs AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
      |    CAST(SUM(q.c * e.c) AS BIGINT) AS iscore, SUM(q.x * e.x) AS dot
      |  FROM codes q JOIN codes e ON q.i = e.i AND q.vec_id <> e.vec_id
      |  WHERE q.vec_id < 8
      |  GROUP BY q.vec_id, e.vec_id
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_ann_sq8" -> (sqBase +
      """, cand AS (
        |  SELECT q_id, n_id, iscore, dot,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY iscore DESC, n_id) AS crk
        |  FROM pairs
        |), rer AS (
        |  SELECT c.q_id, c.n_id, c.iscore,
        |    ROUND(c.dot / (nq.nrm * nn.nrm), 6) AS cos_r6
        |  FROM cand c
        |  JOIN nrm nq ON nq.vec_id = c.q_id
        |  JOIN nrm nn ON nn.vec_id = c.n_id
        |  WHERE c.crk <= 10
        |), fin AS (
        |  SELECT q_id, n_id, cos_r6, iscore,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_r6 DESC, n_id) AS INT) AS rank
        |  FROM rer)
        |SELECT q_id, rank, n_id, cos_r6, iscore
        |FROM fin WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin),
    "eval_recall_curve" -> (sqBase +
      """, rk AS (
        |  SELECT p.q_id, p.n_id,
        |    row_number() OVER (PARTITION BY p.q_id
        |      ORDER BY p.iscore DESC, p.n_id) AS ark,
        |    row_number() OVER (PARTITION BY p.q_id
        |      ORDER BY ROUND(p.dot / nn.nrm, 6) DESC, p.n_id) AS trk
        |  FROM pairs p JOIN nrm nn ON nn.vec_id = p.n_id
        |), perq AS (
        |  SELECT q_id,
        |    SUM(CASE WHEN ark <= 1 AND trk <= 1 THEN 1 ELSE 0 END) AS hit1,
        |    SUM(CASE WHEN ark <= 5 AND trk <= 5 THEN 1 ELSE 0 END) AS hit5,
        |    SUM(CASE WHEN ark <= 10 AND trk <= 10 THEN 1 ELSE 0 END) AS hit10
        |  FROM rk GROUP BY q_id)
        |SELECT CAST(8 AS BIGINT) AS n_queries,
        |  CAST(SUM(hit1) * 1000000 // (count(*) * 1) AS BIGINT)
        |    AS recall_at_1_micro,
        |  CAST(SUM(hit5) * 1000000 // (count(*) * 5) AS BIGINT)
        |    AS recall_at_5_micro,
        |  CAST(SUM(hit10) * 1000000 // (count(*) * 10) AS BIGINT)
        |    AS recall_at_10_micro
        |FROM perq""".stripMargin),
    "cdc_backfill_plan" ->
      """WITH tiles AS (
        |  SELECT o_orderkey,
        |    CAST(length(o_orderpriority) + length(o_orderstatus) + 24
        |      AS BIGINT) AS bytes_est,
        |    ntile(16) OVER (ORDER BY o_orderkey) AS chunk
        |  FROM orders)
        |SELECT CAST(chunk AS BIGINT) AS chunk,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(min(o_orderkey) AS BIGINT) AS key_lo,
        |  CAST(max(o_orderkey) AS BIGINT) AS key_hi,
        |  CAST(sum(bytes_est) AS BIGINT) AS bytes_est
        |FROM tiles GROUP BY chunk ORDER BY chunk""".stripMargin,
  )
}
