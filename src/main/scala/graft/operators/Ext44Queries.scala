package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 7: exact substring-span dedup, Bloom membership
  * auditing, and the feature-hashing featurizer.
  *
  *  - `dedup_substring_spans`: cross-document EXACT token-span
  *    detection (8-token windows, positions kept) — the
  *    memorization-hazard report behind suffix-array training-data
  *    dedup: a span occurring verbatim in many documents is
  *    boilerplate the model will memorize. Doc-level Jaccard
  *    (dedup_ngram_jaccard) cannot see spans shared by otherwise
  *    unrelated docs; this inverted-index form reports each
  *    multi-doc span with its spread.
  *  - `sketch_bloom_fpr`: a deterministic Bloom filter (4096 bits,
  *    k = 3 md5-derived positions) built over half the key space and
  *    probed with the other half — bits set, measured FPR vs the
  *    (1 − e^{−kn/m})^k theory bound. The membership primitive a
  *    100 TB decontamination join pushes down instead of shipping
  *    the member set.
  *  - `text_hashed_bow`: the feature-hashing (hashing-trick)
  *    bag-of-words featurizer — tokens hashed into 64 dims with a
  *    ±1 sign hash, long-form (doc, dim, weight) output for the
  *    low dims. How text becomes a vector without a vocabulary at
  *    corpus scale; fully deterministic via md5 arithmetic.
  *
  * 100 TB shapes: the span index is one (hash → docs) aggregation,
  * skew-safe because an 8-token window is near-unique unless
  * actually duplicated; the Bloom build collapses to 4096 bit rows
  * broadcast to probes; the featurizer is a narrow explode +
  * (doc, dim) rollup with map-side combine.
  */
object Ext44Queries {

  // ---------------------------------------------------------------
  // dedup_substring_spans
  // ---------------------------------------------------------------

  private val SpanLen = 8

  def substringSpans(spark: SparkSession, dir: String): DataFrame = {
    val tk = TextAnalysis.tokens(col("text"))
    val spans = t(spark, dir, "documents")
      .select(col("doc_id"), tk.as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= SpanLen)
      .withColumn("pos",
        explode(sequence(lit(1), col("n") - (SpanLen - 1))))
      .withColumn("span_hash", md5(concat_ws(" ",
        slice(col("tk"), col("pos"), lit(SpanLen)))))
    spans
      .groupBy("span_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") >= 2)
      .orderBy("span_hash")
  }

  // ---------------------------------------------------------------
  // sketch_bloom_fpr
  // ---------------------------------------------------------------

  private val BloomBits = 4096 // 3 hex chars address 16^3 positions

  /** md5-derived bit position for hash function `i` of `key`: the
    * first 3 hex chars of md5("b<i>:<key>") read as a base-16
    * integer — strpos arithmetic so DuckDB mirrors it exactly.
    */
  private def bitPos(i: Int, key: org.apache.spark.sql.Column) = {
    val h = md5(concat(lit(s"b$i:"), key.cast("string")))
    def hx(p: Int) =
      (instr(lit("0123456789abcdef"), substring(h, p, 1)) - 1)
        .cast("long")
    hx(1) * 256 + hx(2) * 16 + hx(3)
  }

  def bloomFpr(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer").select(col("c_custkey"))
    val members = cust.filter(col("c_custkey") % 2 === 0)
    val probes = cust.filter(col("c_custkey") % 2 === 1)
    val setBits = members
      .select(explode(array((0 until 3).map(i =>
        bitPos(i, col("c_custkey"))): _*)).as("bit"))
      .distinct()
    val nBits = broadcast(setBits.agg(
      count(lit(1)).as("n_bits_set")))
    // a probe is (falsely) "in" iff all three of its bits are set
    val probeBits = probes
      .select(col("c_custkey"),
        explode(array((0 until 3).map(i =>
          bitPos(i, col("c_custkey"))): _*)).as("bit"))
    val fp = probeBits.join(setBits, "bit")
      .groupBy("c_custkey").agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") === 3)
    val counts = broadcast(members.agg(count(lit(1)).as("n_members"))
      .crossJoin(probes.agg(count(lit(1)).as("n_probes")))
      .crossJoin(fp.agg(count(lit(1)).as("n_fp"))))
    nBits.crossJoin(counts)
      .withColumn("fpr_micro", expr("n_fp * 1000000 div n_probes"))
      .select("n_members", "n_probes", "n_bits_set", "n_fp",
        "fpr_micro")
  }

  // ---------------------------------------------------------------
  // text_hashed_bow
  // ---------------------------------------------------------------

  def hashedBow(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("w"))
      .withColumn("w", lower(col("w")))
    val h = md5(concat(lit("fh:"), col("w")))
    def hx(p: Int) =
      (instr(lit("0123456789abcdef"), substring(h, p, 1)) - 1)
        .cast("long")
    tok
      // dim: first 2 hex chars mod 64; sign: third hex char parity
      .withColumn("dim", (hx(1) * 16 + hx(2)) % 64)
      .withColumn("sgn", when(hx(3) % 2 === 0, 1L).otherwise(-1L))
      .groupBy("doc_id", "dim")
      .agg(sum(col("sgn")).as("weight"))
      .filter(col("dim") < 8) // long-form sample of the low dims
      .orderBy("doc_id", "dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_substring_spans" -> substringSpans _,
    "sketch_bloom_fpr" -> bloomFpr _,
    "text_hashed_bow" -> hashedBow _,
  )

  val oracle: Map[String, String] = Map(
    "dedup_substring_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), spans AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_slice(tk, i, i + 7), ' '))
        |      AS span_hash
        |  FROM toks, UNNEST(range(1, len(tk) - 6)) AS r(i)
        |  WHERE len(tk) >= 8)
        |SELECT span_hash,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
        |FROM spans GROUP BY span_hash
        |HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY span_hash""".stripMargin,
    "sketch_bloom_fpr" ->
      """WITH cust AS (SELECT c_custkey FROM customer),
        |pos AS (
        |  SELECT c_custkey, c_custkey % 2 AS side,
        |    (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
        |      AS bit
        |  FROM (
        |    SELECT c_custkey,
        |      md5('b' || i || ':' || CAST(c_custkey AS VARCHAR)) AS h
        |    FROM cust, UNNEST(range(0, 3)) AS hh(i))
        |), setbits AS (
        |  SELECT DISTINCT bit FROM pos WHERE side = 0
        |), fp AS (
        |  SELECT p.c_custkey FROM pos p
        |  JOIN setbits s ON s.bit = p.bit
        |  WHERE p.side = 1
        |  GROUP BY p.c_custkey HAVING COUNT(*) = 3
        |)
        |SELECT
        |  CAST((SELECT COUNT(*) FROM cust WHERE c_custkey % 2 = 0)
        |    AS BIGINT) AS n_members,
        |  CAST((SELECT COUNT(*) FROM cust WHERE c_custkey % 2 = 1)
        |    AS BIGINT) AS n_probes,
        |  CAST((SELECT COUNT(*) FROM setbits) AS BIGINT)
        |    AS n_bits_set,
        |  CAST((SELECT COUNT(*) FROM fp) AS BIGINT) AS n_fp,
        |  CAST((SELECT COUNT(*) FROM fp) * 1000000
        |    // (SELECT COUNT(*) FROM cust WHERE c_custkey % 2 = 1)
        |    AS BIGINT) AS fpr_micro""".stripMargin,
    "text_hashed_bow" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    lower(unnest(string_split_regex(trim(text), '\s+'))) AS w
        |  FROM documents
        |), hashed AS (
        |  SELECT doc_id,
        |    ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1))
        |      % 64 AS dim,
        |    CASE WHEN
        |      (strpos('0123456789abcdef', substr(h, 3, 1)) - 1)
        |        % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM (SELECT doc_id, md5('fh:' || w) AS h FROM tok) x)
        |SELECT doc_id, CAST(dim AS BIGINT) AS dim,
        |  CAST(SUM(sgn) AS BIGINT) AS weight
        |FROM hashed
        |WHERE dim < 8
        |GROUP BY doc_id, dim
        |ORDER BY doc_id, dim""".stripMargin,
  )
}
