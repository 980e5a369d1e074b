package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 3: the two current-generation embedding-compression
  * rungs the ANN ladder was still missing.
  *
  *  - `sim_ann_binary`: BINARY QUANTIZATION — each 64-dim vector
  *    collapses to its 64 sign bits packed into two 32-bit words
  *    (16 bytes/vector, the memory-cheapest rung below SQ8's 64), and
  *    retrieval is Hamming top-k via `bit_count(xor)` — pure integer
  *    ops, no floats anywhere in the scan. The report carries an
  *    `in_exact5` audit flag per result: whether the Hamming hit is
  *    also in the exact-cosine top-5, so the recall cost of 1-bit
  *    compression is measured in-query, not assumed.
  *  - `embed_matryoshka`: MRL-style prefix-dimension retrieval — rank
  *    by cosine over only the FIRST 16 of 64 dims (the "matryoshka"
  *    truncation modern embedding models are trained for) and audit
  *    each prefix hit against the full-dimension top-5. The scan cost
  *    drops 4x; the flag column shows what survived.
  *
  * Two 32-bit words, not one 64-bit word: DuckDB's BIGINT `<<` is
  * checked-signed and overflows at bit 63, so the packing stays in
  * shift-safe range on BOTH engines (and bit_count sums are identical).
  *
  * 100 TB shapes: the packed word table is 16 bytes/vector built by one
  * corpus aggregate; queries broadcast (8 rows) against it — a scan of
  * the cheapest possible representation, the entire point of BQ. The
  * exact-cosine audit legs are per-query (|Q| x corpus equi-joined on
  * dimension), identical shape to the proven sim_cosine_topk.
  */
object Ext68Queries {

  private val NQ = 8
  private val K = 5

  private def ee(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        col("x").cast("double").as("x"))

  /** Exact round-6 cosine top-K sets per query over dims [0, dims):
    * (q_id, n_id) pairs — the audit truth both queries compare against.
    */
  private def exactTopK(spark: SparkSession, dir: String,
      dims: Int): DataFrame = {
    val e = ee(spark, dir).filter(col("i") < dims)
    val norms = e.groupBy("vec_id")
      .agg(sqrt(sum(col("x") * col("x"))).as("nrm"))
    val q = e.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("i"), col("x").as("qx"))
    val dots = q.join(e, Seq("i"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("qx") * col("x")).as("dot"))
    val sims = dots
      .join(norms.select(col("vec_id").as("q_id"),
        col("nrm").as("qn")), Seq("q_id"))
      .join(norms, Seq("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(col("dot") / (col("qn") * col("nrm")), 6).as("sim"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rk", row_number().over(w)).filter(col("rk") <= K)
      .select("q_id", "n_id")
  }

  // ---------------------------------------------------------------
  // sim_ann_binary
  // ---------------------------------------------------------------

  def annBinary(spark: SparkSession, dir: String): DataFrame = {
    val bits = ee(spark, dir)
      .select(col("vec_id"), col("i"),
        when(col("x") >= 0, lit(1L)).otherwise(lit(0L)).as("b"))
    val words = bits.groupBy("vec_id").agg(
      sum(when(col("i") < 32, col("b") *
        expr("shiftleft(cast(1 as bigint), cast(i as int))"))
        .otherwise(0L)).as("w0"),
      sum(when(col("i") >= 32, col("b") *
        expr("shiftleft(cast(1 as bigint), cast(i - 32 as int))"))
        .otherwise(0L)).as("w1"))
    val q = words.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("w0").as("q0"),
        col("w1").as("q1"))
    val ham = words.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("cast(bit_count(w0 ^ q0) + bit_count(w1 ^ q1) as bigint)")
          .as("hamming"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("hamming"), col("n_id"))
    val top = ham.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
    top.join(exactTopK(spark, dir, 64).withColumn("hit", lit(1L)),
        Seq("q_id", "n_id"), "left")
      .select(col("q_id"), col("n_id"), col("hamming"), col("rank"),
        coalesce(col("hit"), lit(0L)).as("in_exact5"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // embed_matryoshka
  // ---------------------------------------------------------------

  def matryoshka(spark: SparkSession, dir: String): DataFrame = {
    val e16 = ee(spark, dir).filter(col("i") < 16)
    val norms = e16.groupBy("vec_id")
      .agg(sqrt(sum(col("x") * col("x"))).as("nrm"))
    val q = e16.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("q_id"), col("i"), col("x").as("qx"))
    val sims = q.join(e16, Seq("i"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("qx") * col("x")).as("dot"))
      .join(norms.select(col("vec_id").as("q_id"),
        col("nrm").as("qn")), Seq("q_id"))
      .join(norms, Seq("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(col("dot") / (col("qn") * col("nrm")), 6).as("sim16"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim16").desc, col("n_id"))
    val top = sims
      .withColumn("rank16", row_number().over(w).cast("long"))
      .filter(col("rank16") <= K)
    top.join(exactTopK(spark, dir, 64).withColumn("hit", lit(1L)),
        Seq("q_id", "n_id"), "left")
      .select(col("q_id"), col("n_id"), col("rank16"),
        (round(col("sim16") * 1e6, 0)).cast("long").as("sim16_micro"),
        coalesce(col("hit"), lit(0L)).as("in_full5"))
      .orderBy("q_id", "rank16")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_binary" -> annBinary _,
    "embed_matryoshka" -> matryoshka _,
  )

  /** Shared oracle prefix: exploded embeddings and the exact-cosine
    * top-5 set over dims < `dims` (1-based subscripts in DuckDB).
    */
  private def exactSql(dims: Int): String =
    s"""ee AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
    CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), ef AS (SELECT * FROM ee WHERE i < $dims
), norms AS (
  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ef GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
  FROM ef q JOIN ef e ON q.i = e.i AND q.vec_id <> e.vec_id
  WHERE q.vec_id < $NQ
  GROUP BY 1, 2
), extop AS (
  SELECT q_id, n_id FROM (
    SELECT d.q_id, d.n_id,
      ROW_NUMBER() OVER (PARTITION BY d.q_id ORDER BY
        ROUND(d.dot / (nq.nrm * ne.nrm), 6) DESC, d.n_id) AS rk
    FROM dots d
    JOIN norms nq ON nq.vec_id = d.q_id
    JOIN norms ne ON ne.vec_id = d.n_id) z
  WHERE rk <= $K
)"""

  val oracle: Map[String, String] = Map(
    "sim_ann_binary" -> (s"""WITH ${exactSql(64)}, bits AS (
  SELECT vec_id, i, CASE WHEN x >= 0 THEN 1 ELSE 0 END AS b FROM ee
), words AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN i < 32
      THEN b * (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END)
      AS BIGINT) AS w0,
    CAST(SUM(CASE WHEN i >= 32
      THEN b * (CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END)
      AS BIGINT) AS w1
  FROM bits GROUP BY vec_id
), ham AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
    CAST(bit_count(xor(c.w0, q.w0)) + bit_count(xor(c.w1, q.w1))
      AS BIGINT) AS hamming
  FROM words q JOIN words c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < $NQ
), top AS (
  SELECT q_id, n_id, hamming,
    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY hamming, n_id) AS BIGINT) AS rank
  FROM ham
)
SELECT t.q_id, t.n_id, t.hamming, t.rank,
  CAST(CASE WHEN e.n_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS in_exact5
FROM top t LEFT JOIN extop e ON e.q_id = t.q_id AND e.n_id = t.n_id
WHERE t.rank <= $K
ORDER BY t.q_id, t.rank"""),
    "embed_matryoshka" -> (s"""WITH ${exactSql(64)}, e16 AS (
  SELECT * FROM ee WHERE i < 16
), n16 AS (
  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM e16 GROUP BY vec_id
), d16 AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
  FROM e16 q JOIN e16 e ON q.i = e.i AND q.vec_id <> e.vec_id
  WHERE q.vec_id < $NQ
  GROUP BY 1, 2
), s16 AS (
  SELECT d.q_id, d.n_id,
    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim16
  FROM d16 d
  JOIN n16 nq ON nq.vec_id = d.q_id
  JOIN n16 ne ON ne.vec_id = d.n_id
), top AS (
  SELECT q_id, n_id, sim16,
    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY sim16 DESC, n_id) AS BIGINT) AS rank16
  FROM s16
)
SELECT t.q_id, t.n_id, t.rank16,
  CAST(ROUND(t.sim16 * 1e6, 0) AS BIGINT) AS sim16_micro,
  CAST(CASE WHEN e.n_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS in_full5
FROM top t LEFT JOIN extop e ON e.q_id = t.q_id AND e.n_id = t.n_id
WHERE t.rank16 <= $K
ORDER BY t.q_id, t.rank16"""),
  )
}
