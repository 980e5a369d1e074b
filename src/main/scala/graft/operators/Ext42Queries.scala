package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 5: banding recall audit, time-range window frames,
  * and overlapped document chunking.
  *
  *  - `eval_lsh_recall`: recall of the stored 16×4 LSH banding
  *    against the EXACT shared-shingle pair set, per Jaccard decile
  *    — the empirical S-curve every banding config promises in
  *    theory ((1−(1−s^r)^b)); buckets near the 0.1 threshold should
  *    show the misses, high-J buckets should be ~complete. This is
  *    the audit that justifies dedup_lsh_tuning's choice.
  *  - `q76_range_window`: RANGE-framed window (trailing 3600-second
  *    sum per user) — the TIME-based frame the ROWS-framed family
  *    cannot express: peers at equal timestamps enter the frame
  *    together regardless of row order, which is also what makes the
  *    result deterministic under ties.
  *  - `tok_chunk_overlap`: sliding-window chunking with overlap
  *    (size 32, stride 24 — sized to the synthetic corpus, whose docs run ~20-90 tokens; production sizes are 10x, the shape is identical) — the context-window chunker every
  *    pretraining / retrieval corpus build runs; emits the chunk
  *    table (offsets, lengths, fingerprints) a downstream embedder
  *    consumes. text_pack_sequences is the dual (greedy packing, no
  *    overlap); this is the fixed-stride form.
  *
  * 100 TB shapes: the recall audit joins two pair sets that are both
  * collision/co-occurrence-bounded (never all-pairs); the range
  * window is one shuffle on user_id with a merge-sweep frame; the
  * chunker is a narrow per-row explode (chunks/doc is n/stride — no
  * shuffle at all before any downstream aggregate).
  */
object Ext42Queries {

  // ---------------------------------------------------------------
  // eval_lsh_recall
  // ---------------------------------------------------------------

  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    val sh = NearDupGraph.shingleTable(spark, dir)
    val szOf = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    // exact ground truth: every pair sharing >= 1 shingle, J >= 0.1
    val truePairs = sh.as("a")
      .join(sh.select(col("id").as("id_b"), col("shingle")).as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.id") < col("id_b"))
      .groupBy(col("a.id").as("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
      .join(szOf.select(col("id").as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(szOf.select(col("id").as("id_b"), col("sz").as("sz_b")),
        "id_b")
      .withColumn("j_micro",
        expr("common * 1000000 div (sz_a + sz_b - common)"))
      .filter(col("j_micro") >= 100000L)
      .select("id_a", "id_b", "j_micro")
    val found = NearDupGraph.lshPairs(spark, dir)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    truePairs.join(found, Seq("id_a", "id_b"), "left")
      .withColumn("bucket", least(expr("j_micro div 100000"), lit(9L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .withColumn("recall_micro",
        expr("n_found * 1000000 div n_true"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------
  // q76_range_window
  // ---------------------------------------------------------------

  def rangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val w = Window.partitionBy("user_id").orderBy("tsec")
      .rangeBetween(-3600L, 0L)
    ev.withColumn("w_sum", sum("vm").over(w))
      .withColumn("w_n", count(lit(1)).over(w))
      .select("user_id", "event_id", "tsec", "vm", "w_sum", "w_n")
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------
  // tok_chunk_overlap
  // ---------------------------------------------------------------

  private val ChunkSize = 32
  private val Stride = 24

  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tk = TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"), tk.as("tk"),
        size(tk).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("n_chunks",
        expr(s"(greatest(n_tokens - $ChunkSize, 0) + ${Stride - 1})" +
          s" div $Stride + 1"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start", col("chunk_idx") * Stride + 1)
      .withColumn("chunk_len",
        least(lit(ChunkSize.toLong), col("n_tokens") - col("start") + 1))
      .withColumn("fp", md5(concat_ws(" ",
        slice(col("tk"), col("start").cast("int"),
          col("chunk_len").cast("int")))))
      .select("doc_id", "chunk_idx", "start", "chunk_len", "fp")
      .orderBy("doc_id", "chunk_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_lsh_recall" -> lshRecall _,
    "q76_range_window" -> rangeWindow _,
    "tok_chunk_overlap" -> chunkOverlap _,
  )

  val oracle: Map[String, String] = Map(
    "eval_lsh_recall" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
        |), sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |tp AS (
        |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY 1, 2
        |), truep AS (
        |  SELECT tp.id_a, tp.id_b,
        |    tp.common * 1000000 // (sa.sz + sb.sz - tp.common)
        |      AS j_micro
        |  FROM tp
        |  JOIN sizes sa ON sa.id = tp.id_a
        |  JOIN sizes sb ON sb.id = tp.id_b
        |  WHERE tp.common * 1000000 // (sa.sz + sb.sz - tp.common)
        |    >= 100000
        |), sig AS (
        |  SELECT id, seed, MIN(md5(seed || '|' || shingle)) AS mh
        |  FROM sh, UNNEST(range(0, 16)) AS sd(seed)
        |  GROUP BY id, seed
        |), bandsig AS (
        |  SELECT id, seed // 4 AS band,
        |    string_agg(mh, ',' ORDER BY seed) AS bsig
        |  FROM sig GROUP BY id, seed // 4
        |), cands AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
        |)
        |SELECT least(t.j_micro // 100000, 9) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_true,
        |  CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
        |    * 1000000 // COUNT(*) AS BIGINT) AS recall_micro
        |FROM truep t
        |LEFT JOIN cands c ON c.id_a = t.id_a AND c.id_b = t.id_b
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q76_range_window" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events WHERE user_id % 10 = 0)
        |SELECT user_id, event_id, tsec, vm,
        |  CAST(SUM(vm) OVER w AS BIGINT) AS w_sum,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS w_n
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY tsec
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,
    "tok_chunk_overlap" ->
      """WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), d AS (
        |  SELECT doc_id, tk, n_tokens,
        |    (greatest(n_tokens - 32, 0) + 23) // 24 + 1 AS n_chunks
        |  FROM base WHERE n_tokens > 0
        |), chunks AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |    CAST(i * 24 + 1 AS BIGINT) AS start,
        |    CAST(least(32, n_tokens - (i * 24 + 1) + 1) AS BIGINT)
        |      AS chunk_len,
        |    md5(array_to_string(
        |      list_slice(tk, i * 24 + 1,
        |        i * 24 + least(32, n_tokens - (i * 24 + 1) + 1)),
        |      ' ')) AS fp
        |  FROM d, UNNEST(range(0, n_chunks)) AS r(i))
        |SELECT doc_id, chunk_idx, start, chunk_len, fp
        |FROM chunks
        |ORDER BY doc_id, chunk_idx""".stripMargin,
  )
}
