package graft.operators

import java.util.concurrent.ConcurrentHashMap

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 batch G: per-file Bloom-filter point-lookup skipping (the
  * complement of layout_zonemap_prune's min/max range skipping) and
  * malformed-record CSV ingestion (the PERMISSIVE/corrupt-column
  * contract every dirty-data ingest pipeline leans on).
  */
object Ext79Queries {

  // ---------------------------------------------------------------
  // layout_bloom_prune
  // ---------------------------------------------------------------

  /** Per-file Bloom filters (1024 bits = 32×32-bit words, k=2 md5
    * hashes — packed into 32-bit lattice words, never a 64-bit shift)
    * over l_partkey under the natural orderkey-cut layout, probed
    * with 8 deterministic point predicates: files a zone map cannot
    * skip (partkeys scatter across every file) but a Bloom CAN —
    * maybe-files vs actually-containing files and the realized
    * false-positive rate per probe. The point-lookup half of the
    * data-skipping story next to layout_zonemap_prune's range half.
    *
    * 100 TB shape: bit positions are a narrow projection; the Bloom
    * table is one keyed bit_or aggregate (≤ 64×32 rows); probes and
    * membership checks run on that bounded table. The 1-row bounds
    * broadcast feeds file cuts and probe keys.
    */
  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    def pos(tag: String, c: Column): Column =
      conv(substring(md5(concat(lit(tag), c.cast("string"))), 1, 8),
        16, 10).cast("long") % 1024
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val bounds = broadcast(li.agg(max("l_orderkey").as("max_ok"),
      max("l_partkey").as("max_pk")))
    val base = li.crossJoin(bounds)
      .withColumn("file_id", expr("l_orderkey div (max_ok div 64 + 1)"))
      .cache() // bloom build + the exact-containment audit share it
    val bloom = base
      .select(col("file_id"), pos("bf1:", col("l_partkey")).as("p"))
      .unionByName(base.select(col("file_id"),
        pos("bf2:", col("l_partkey")).as("p")))
      .withColumn("word", expr("p div 32"))
      .withColumn("b", expr("p % 32"))
      .groupBy("file_id", "word")
      .agg(expr("bit_or(shiftleft(1L, cast(b as int)))").as("bw"))
    val probes = bounds
      .select(explode(lit((1 to 8).toArray)).as("qi"), col("max_pk"))
      .select(col("qi").cast("long").as("q"),
        expr("max_pk * qi div 9").as("pk"))
    // k=2 needs per probe, deduped when both hashes land on one bit
    val needs = probes
      .select(col("q"), col("pk"),
        explode(array(pos("bf1:", col("pk")),
          pos("bf2:", col("pk")))).as("p"))
      .distinct()
      .withColumn("word", expr("p div 32"))
      .withColumn("b", expr("p % 32"))
    val needCounts = needs.groupBy("q", "pk")
      .agg(count(lit(1)).as("n_need"))
    val maybe = needs.join(bloom, Seq("word"))
      .filter(expr("(bw & shiftleft(1L, cast(b as int))) != 0"))
      .groupBy("q", "pk", "file_id").agg(count(lit(1)).as("n_hit"))
      .join(broadcast(needCounts), Seq("q", "pk"))
      .filter(col("n_hit") === col("n_need"))
      .groupBy("q", "pk").agg(count(lit(1)).as("maybe_files"))
    val actual = base
      .join(broadcast(probes), col("l_partkey") === col("pk"))
      .groupBy("q", "pk").agg(countDistinct("file_id").as("actual_files"))
    val nf = base.agg(countDistinct("file_id").as("n_files"))
    probes.crossJoin(broadcast(nf))
      .join(maybe, Seq("q", "pk"), "left")
      .join(actual, Seq("q", "pk"), "left")
      .na.fill(0L, Seq("maybe_files", "actual_files"))
      .withColumn("fp_files", col("maybe_files") - col("actual_files"))
      .withColumn("fpr_micro", expr(
        "fp_files * 1000000 div greatest(n_files - actual_files, 1)"))
      .select("q", "pk", "n_files", "maybe_files", "actual_files",
        "fp_files", "fpr_micro")
      .orderBy("q")
  }

  // ---------------------------------------------------------------
  // src_csv_corrupt
  // ---------------------------------------------------------------

  private val written = new ConcurrentHashMap[String, String]()

  /** Materialize the dirty CSV once per JVM per dir: every 17th
    * event's line is malformed (non-numeric key and value fields), the
    * rest are clean "user_id,event_type,vm" rows. The path is derived
    * from the FULL sanitized dir string (round-8 ADVICE: two dirs with
    * colliding 32-bit hashCodes must not overwrite each other's
    * fixture while the cache map still points both at one path) and a
    * shutdown hook deletes whatever this JVM wrote.
    */
  private def dirtyCsv(spark: SparkSession, dir: String): String =
    written.computeIfAbsent(s"dirty:$dir", _ => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-dirty-${ProcessHandle.current().pid()}-" +
          dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        try rm(new java.io.File(p))
        catch { case scala.util.control.NonFatal(_) => () }
      }
      t(spark, dir, "events")
        .select(when(col("event_id") % 17 === 0,
          concat(lit("x"), col("user_id").cast("string"), lit(","),
            col("event_type"), lit(",bad")))
          .otherwise(concat(col("user_id").cast("string"), lit(","),
            col("event_type"), lit(","),
            round(col("value") * 1000).cast("long").cast("string")))
          .as("value"))
        .write.mode("overwrite").text(p)
      p
    })

  /** PERMISSIVE-mode ingest of a dirty CSV with the corrupt-record
    * column: malformed lines surface as `_corrupt` rows instead of
    * failing the job (the reference's dead-letter contract,
    * generalized to file ingest — cdc_dead_letter's batch-source
    * sibling). Reports the per-type aggregate over CLEAN rows plus
    * one `__corrupt` accounting row; the oracle recomputes both from
    * the parquet source via the deterministic corruption rule, so the
    * hash gate proves the parser dropped exactly the malformed lines
    * and nothing else.
    *
    * 100 TB shape: a line-splittable CSV scan with no inference pass
    * (explicit schema), one map-side-combined aggregate. The cache()
    * is the documented Spark requirement for referencing only the
    * corrupt column in a filter.
    */
  def csvCorrupt(spark: SparkSession, dir: String): DataFrame = {
    val path = dirtyCsv(spark, dir)
    val schema = StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("vm", LongType),
      StructField("_corrupt", StringType)))
    val r = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)
      .cache()
    val good = r.filter(col("_corrupt").isNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("vm").as("s_milli"))
    val bad = r.filter(col("_corrupt").isNotNull)
      .agg(count(lit(1)).as("n"))
      .select(lit("__corrupt").as("event_type"), col("n"),
        lit(null).cast("long").as("s_milli"))
    good.unionByName(bad).orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_bloom_prune" -> bloomPrune _,
    "src_csv_corrupt" -> csvCorrupt _,
  )

  val oracle: Map[String, String] = Map(
    "layout_bloom_prune" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |), bounds AS (
        |  SELECT CAST(MAX(l_orderkey) AS BIGINT) AS max_ok,
        |    CAST(MAX(l_partkey) AS BIGINT) AS max_pk
        |  FROM li
        |), base AS (
        |  SELECT l.l_partkey,
        |    l.l_orderkey // (b.max_ok // 64 + 1) AS file_id
        |  FROM li l, bounds b
        |), pos AS (
        |  SELECT file_id,
        |    ('0x' || substr(md5('bf1:' || CAST(l_partkey AS VARCHAR)),
        |      1, 8))::UBIGINT % 1024 AS p
        |  FROM base
        |  UNION ALL
        |  SELECT file_id,
        |    ('0x' || substr(md5('bf2:' || CAST(l_partkey AS VARCHAR)),
        |      1, 8))::UBIGINT % 1024 AS p
        |  FROM base
        |), bloom AS (
        |  SELECT file_id, p // 32 AS word,
        |    CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT))
        |      AS BIGINT) AS bw
        |  FROM pos GROUP BY file_id, p // 32
        |), probes AS (
        |  SELECT CAST(q AS BIGINT) AS q,
        |    (b.max_pk * q) // 9 AS pk
        |  FROM bounds b, UNNEST(range(1, 9)) AS qq(q)
        |), needs AS (
        |  SELECT DISTINCT q, pk, p FROM (
        |    SELECT q, pk,
        |      ('0x' || substr(md5('bf1:' || CAST(pk AS VARCHAR)),
        |        1, 8))::UBIGINT % 1024 AS p
        |    FROM probes
        |    UNION ALL
        |    SELECT q, pk,
        |      ('0x' || substr(md5('bf2:' || CAST(pk AS VARCHAR)),
        |        1, 8))::UBIGINT % 1024 AS p
        |    FROM probes)
        |), need_counts AS (
        |  SELECT q, pk, CAST(COUNT(*) AS BIGINT) AS n_need
        |  FROM needs GROUP BY q, pk
        |), hits AS (
        |  SELECT n.q, n.pk, bl.file_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_hit
        |  FROM needs n
        |  JOIN bloom bl ON bl.word = n.p // 32
        |  WHERE (bl.bw & (CAST(1 AS BIGINT) << CAST(n.p % 32 AS INT)))
        |    <> 0
        |  GROUP BY n.q, n.pk, bl.file_id
        |), maybe AS (
        |  SELECT h.q, h.pk, CAST(COUNT(*) AS BIGINT) AS maybe_files
        |  FROM hits h JOIN need_counts c
        |    ON c.q = h.q AND c.pk = h.pk AND h.n_hit = c.n_need
        |  GROUP BY h.q, h.pk
        |), act AS (
        |  SELECT p.q, p.pk,
        |    CAST(COUNT(DISTINCT b.file_id) AS BIGINT) AS actual_files
        |  FROM base b JOIN probes p ON p.pk = b.l_partkey
        |  GROUP BY p.q, p.pk
        |), nf AS (
        |  SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) AS n_files
        |  FROM base)
        |SELECT p.q, p.pk, nf.n_files,
        |  COALESCE(m.maybe_files, 0) AS maybe_files,
        |  COALESCE(a.actual_files, 0) AS actual_files,
        |  COALESCE(m.maybe_files, 0) - COALESCE(a.actual_files, 0)
        |    AS fp_files,
        |  CAST((COALESCE(m.maybe_files, 0)
        |      - COALESCE(a.actual_files, 0)) * 1000000
        |    // greatest(nf.n_files - COALESCE(a.actual_files, 0), 1)
        |    AS BIGINT) AS fpr_micro
        |FROM probes p CROSS JOIN nf
        |LEFT JOIN maybe m ON m.q = p.q AND m.pk = p.pk
        |LEFT JOIN act a ON a.q = p.q AND a.pk = p.pk
        |ORDER BY p.q""".stripMargin,
    "src_csv_corrupt" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS s_milli
        |FROM events WHERE event_id % 17 <> 0
        |GROUP BY event_type
        |UNION ALL
        |SELECT '__corrupt' AS event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(NULL AS BIGINT) AS s_milli
        |FROM events WHERE event_id % 17 = 0
        |ORDER BY event_type""".stripMargin,
  )
}
