package graft.operators

import java.util.concurrent.ConcurrentHashMap

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 18: the remaining ingest front doors — line-based
  * text and whole-file binary — plus outer-explode null semantics.
  *
  *  - `src_text_roundtrip`: the `text` source (one row per line) —
  *    what a raw web-scrape drop actually looks like before any
  *    schema exists. The corpus (verified newline-free) is written
  *    as lines and read back; the aggregate fingerprint (row count,
  *    byte sum, XOR of line hashes) is computed from the READ-BACK
  *    lines while the oracle computes it from the parquet source —
  *    hash equality proves the line roundtrip lost nothing. XOR
  *    makes the check order-independent, since line files guarantee
  *    no row order.
  *  - `src_binaryfile_scan`: the `binaryFile` source — the
  *    multimodal ingest door (images/audio arrive as opaque files).
  *    A bounded 64-asset directory is materialized once per JVM;
  *    the scan parses the asset id from the file NAME, and emits
  *    per-asset length + md5 of the BYTES, matched by the oracle
  *    against the source-of-truth table.
  *  - `q84_explode_outer`: `explode_outer` — the null-preserving
  *    lateral. Docs whose filter-match list is empty must SURVIVE
  *    as a null row (an inner explode silently drops them — the
  *    classic silent-data-loss bug in curation pipelines); the
  *    DuckDB mirror makes the same semantics explicit by unnesting
  *    `[NULL]` for empty lists.
  *
  * 100 TB shapes: text lines split per-line (fully splittable
  * scan); binaryFile deliberately does NOT split (one file = one
  * row = one task) — correct for media blobs where the decoder
  * needs whole-file bytes; explode_outer is a narrow per-row
  * generator with no shuffle.
  */
object Ext55Queries {

  private val written = new ConcurrentHashMap[String, String]()

  private def tmpPath(tag: String, dir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-${ProcessHandle.current().pid()}-" +
        Integer.toHexString(dir.hashCode)).toString

  // ---------------------------------------------------------------
  // src_text_roundtrip
  // ---------------------------------------------------------------

  def textRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = written.computeIfAbsent(s"text:$dir", _ => {
      val p = tmpPath("text", dir)
      t(spark, dir, "documents").select(col("text"))
        .write.mode("overwrite").format("text").save(p)
      p
    })
    spark.read.format("text").load(path)
      .select(col("value").as("line"))
      .agg(count(lit(1)).as("n_lines"),
        sum(octet_length(col("line"))).as("n_bytes"),
        expr("bit_xor(cast(conv(substring(md5(line), 1, 15), 16, 10)" +
          " as bigint))").as("xor_h"))
  }

  // ---------------------------------------------------------------
  // src_binaryfile_scan
  // ---------------------------------------------------------------

  def binaryFileScan(spark: SparkSession, dir: String): DataFrame = {
    val path = written.computeIfAbsent(s"binfile:$dir", _ => {
      val p = tmpPath("binfile", dir)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      // bounded asset drop: 64 files, written once per JVM — the
      // demonstration is the SCAN, not a distributed write
      t(spark, dir, "documents").filter(col("doc_id") < 64)
        .select("doc_id", "text").collect().foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(p, s"${r.getLong(0)}.bin"),
            r.getString(1).getBytes("UTF-8"))
        }
      p
    })
    spark.read.format("binaryFile").load(path)
      .select(
        regexp_extract(col("path"), "(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("n_bytes"),
        md5(col("content")).as("checksum"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // q84_explode_outer
  // ---------------------------------------------------------------

  def explodeOuter(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        filter(TextAnalysis.tokens(col("text")),
          tk => lower(tk).startsWith("z")).as("zs"))
    docs.select(col("doc_id"), explode_outer(col("zs")).as("z"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("doc_id").as("n_docs"),
        sum(when(col("z").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        count(col("z")).as("n_matches"),
        countDistinct(col("z")).as("n_distinct_z"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_text_roundtrip" -> textRoundtrip _,
    "src_binaryfile_scan" -> binaryFileScan _,
    "q84_explode_outer" -> explodeOuter _,
  )

  val oracle: Map[String, String] = Map(
    "src_text_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15))::UBIGINT
        |    AS BIGINT)) AS BIGINT) AS xor_h
        |FROM documents""".stripMargin,
    "src_binaryfile_scan" ->
      """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum
        |FROM documents WHERE doc_id < 64
        |ORDER BY doc_id""".stripMargin,
    "q84_explode_outer" ->
      """WITH zs AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      tk -> lower(tk) LIKE 'z%') AS l
        |  FROM documents
        |), ex AS (
        |  SELECT doc_id,
        |    unnest(CASE WHEN len(l) = 0
        |      THEN [CAST(NULL AS VARCHAR)] ELSE l END) AS z
        |  FROM zs)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN z IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unmatched,
        |  CAST(count(z) AS BIGINT) AS n_matches,
        |  CAST(count(DISTINCT z) AS BIGINT) AS n_distinct_z
        |FROM ex""".stripMargin,
  )
}
