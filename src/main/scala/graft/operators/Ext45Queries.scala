package graft.operators

import java.util.concurrent.ConcurrentHashMap

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-6 batch 8: file-format sink/source roundtrips — the
  * format-breadth leg of §2.3's "file-format scans/sinks" row, which
  * until now only parquet witnessed.
  *
  * Each query writes the typed changelog projection to a non-parquet
  * format (CSV / JSON-lines / ORC), reads it back with an EXPLICIT
  * schema (no inferSchema — schema inference is a full extra pass at
  * 100 TB and non-deterministic under dirty data), and aggregates.
  * The DuckDB oracle computes the identical aggregate straight from
  * the parquet source — so the hash gate proves the write→read
  * roundtrip is LOSSLESS for every value, not merely that the reader
  * runs. Writes happen once per JVM per (format, dir) — they are the
  * sink demonstration; the measured steady state is the scan.
  *
  * 100 TB shapes: all three scans are splittable (CSV/JSON by line,
  * ORC by stripe), so the read parallelizes like the parquet scan;
  * the aggregate is the same map-side-combined rollup in each case.
  * ORC additionally carries min/max stripe stats (predicate pushdown
  * parity with parquet); CSV/JSON pay full-scan parsing, which is
  * exactly why a pipeline converts them to columnar on ingest.
  */
object Ext45Queries {

  private val written = new ConcurrentHashMap[String, String]()

  private val rtSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("vm", LongType)))

  private def src(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").select(col("user_id"), col("event_type"),
      round(col("value") * 1000).cast("long").as("vm"))

  /** Write once per JVM per (format, dir); return the path. */
  private def materialize(spark: SparkSession, dir: String,
      fmt: String, opts: Map[String, String] = Map.empty): String =
    written.computeIfAbsent(s"$fmt:$dir", _ => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-rt-${ProcessHandle.current().pid()}-$fmt-" +
          Integer.toHexString(dir.hashCode)).toString
      src(spark, dir).write.mode("overwrite").format(fmt)
        .options(opts).save(p)
      p
    })

  private def roundtrip(spark: SparkSession, dir: String,
      fmt: String, opts: Map[String, String] = Map.empty): DataFrame = {
    val path = materialize(spark, dir, fmt, opts)
    val back = spark.read.schema(rtSchema).format(fmt).options(opts)
      .load(path)
    back.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("vm").as("s_milli"),
        countDistinct(col("user_id")).as("n_users"),
        min("vm").as("min_milli"),
        max("vm").as("max_milli"))
      .orderBy("event_type")
  }

  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "csv")

  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "json")

  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "orc")

  /** Spark 4's NATIVE XML data source (no external connector) — the
    * reference's own config interchange format, round-tripped as
    * data: write with an explicit rowTag, read back with the same
    * explicit schema + rowTag (XML schema inference is a full extra
    * pass, same rationale as the CSV/JSON rule). Like CSV/JSON, XML
    * is an ingest-only format at 100 TB — scanned once, converted to
    * columnar — and this query is that ingest leg's losslessness
    * proof.
    */
  def xmlRoundtrip(spark: SparkSession, dir: String): DataFrame =
    roundtrip(spark, dir, "xml", Map("rowTag" -> "row"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_roundtrip" -> csvRoundtrip _,
    "src_jsonl_roundtrip" -> jsonlRoundtrip _,
    "src_orc_roundtrip" -> orcRoundtrip _,
    "src_xml_roundtrip" -> xmlRoundtrip _,
  )

  // the oracle reads the PARQUET source directly: hash equality
  // proves the non-parquet roundtrip lost nothing
  private val aggSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
      |    AS s_milli,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(min(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
      |    AS min_milli,
      |  CAST(max(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
      |    AS max_milli
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "src_csv_roundtrip" -> aggSql,
    "src_jsonl_roundtrip" -> aggSql,
    "src_orc_roundtrip" -> aggSql,
    "src_xml_roundtrip" -> aggSql,
  )
}
