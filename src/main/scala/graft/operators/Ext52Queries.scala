package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 15: error-safe arithmetic surface, shard-merged
  * table checksums, and cross-modal A/V sync recovery.
  *
  *  - `q82_try_arithmetic`: the `try_*` family (try_cast, try_add
  *    overflow→NULL, division-by-zero→NULL) — the error-safe lane a
  *    100 TB ingest needs so one malformed row NULLs out instead of
  *    killing a 6-hour job. The oracle mirrors each TRY with its
  *    explicit CASE guard, proving the NULL semantics match.
  *  - `dq_table_checksum`: order-independent table fingerprints —
  *    per-shard (user_id % 16) row count, XOR of 60-bit row hashes,
  *    and a bounded additive check (sum of the hash's low 20 bits),
  *    plus the TOTAL row folded FROM THE SHARD ROWS (xor of xors,
  *    sum of sums). XOR/sum are the distributive fingerprints
  *    replication reconciliation uses at 100 TB: each side computes
  *    shard checksums locally, compares totals first, then bisects
  *    into the one shard that disagrees.
  *  - `mm_av_sync`: audio/video alignment — the audio track's onset
  *    detector fires on the video's keyframe events offset by a
  *    per-media transport drift (media_id % 7 − 3), plus
  *    detector-specific noise anchors. The estimator scans lags
  *    −3…3, counts exact anchor coincidences per lag, and argmaxes
  *    — recovering the planted drift where the shared events
  *    dominate the accidental ones.
  *
  * 100 TB shapes: TRY expressions are codegen'd row-local; the
  * checksum is one map-side-combined aggregate per shard (the merge
  * row is |shards| work); A/V sync explodes 7 bounded lags per
  * anchor into an equi-join on (media, position) — never a window
  * scan over frames.
  */
object Ext52Queries {

  // ---------------------------------------------------------------
  // q82_try_arithmetic
  // ---------------------------------------------------------------

  def tryArithmetic(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(col("event_id"),
      col("event_type"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
      // a mixed-quality string column: every third row numeric, the
      // rest unparseable
      .withColumn("raw",
        when(col("event_id") % 3 === 0, col("vm").cast("string"))
          .otherwise(col("event_type")))
    ev.select(col("event_type"), col("vm"),
        expr("try_cast(raw as bigint)").as("parsed"),
        // overflow lane: any vm beyond its own parity bit pushes the
        // sum past Long.MaxValue -> NULL
        expr("try_add(9223372036854775807 - pmod(vm, 2), vm)")
          .as("ov"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("parsed")).as("n_parsed"),
        sum("parsed").as("s_parsed"),
        sum(when(col("ov").isNull, 1L).otherwise(0L)).as("n_overflow"),
        // division-by-zero lane: NULL out, count survivors
        count(expr("try_divide(vm, pmod(vm, 5))")).as("n_div_ok"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // dq_table_checksum
  // ---------------------------------------------------------------

  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val rows = t(spark, dir, "events").select(
      pmod(col("user_id"), lit(16)).cast("long").as("shard"),
      conv(substring(md5(concat_ws("|",
        col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)"))), 1, 15), 16, 10)
        .cast("long").as("rh"))
    val shards = rows.groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(rh)").as("xor_h"),
        sum(pmod(col("rh"), lit(1048576L))).as("sum_lo"))
      .cache()
    // the TOTAL row folds the SHARD results, not the raw rows — the
    // distributive merge a two-sided reconciliation actually runs
    val total = shards.agg(
      sum("n_rows").as("n_rows"),
      expr("bit_xor(xor_h)").as("xor_h"),
      sum("sum_lo").as("sum_lo"))
      .withColumn("shard", lit(-1L))
    shards.unionByName(total.select("shard", "n_rows", "xor_h", "sum_lo"))
      .orderBy("shard")
  }

  // ---------------------------------------------------------------
  // mm_av_sync
  // ---------------------------------------------------------------

  def avSync(spark: SparkSession, dir: String): DataFrame = {
    val kf = Ext21Queries.keyframes(spark, dir)
      .select(col("media_id"), col("seg_no"),
        col("key_frame").as("f")).cache()
    val drift = (pmod(col("media_id"), lit(7)) - 3).cast("long")
    val audio = kf
      .select(col("media_id"), (col("f") + drift).as("a"))
      .unionByName(kf.filter(col("seg_no") % 3 === 1)
        .select(col("media_id"), (col("f") * 2 + 5).as("a")))
    val lags = spark.range(-3, 4).select(col("id").as("lag"))
    val scored = audio.crossJoin(broadcast(lags))
      .select(col("media_id"), (col("a") + col("lag")).as("f"),
        col("lag"))
      .join(kf.select("media_id", "f"), Seq("media_id", "f"))
      .groupBy("media_id", "lag")
      .agg(count(lit(1)).as("n_aligned"))
    val w = Window.partitionBy("media_id")
      .orderBy(col("n_aligned").desc, col("lag"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("media_id"), col("lag").as("best_lag"),
        col("n_aligned"))
      .orderBy("media_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_try_arithmetic" -> tryArithmetic _,
    "dq_table_checksum" -> tableChecksum _,
    "mm_av_sync" -> avSync _,
  )

  val oracle: Map[String, String] = Map(
    "q82_try_arithmetic" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    CASE WHEN event_id % 3 = 0
        |      THEN CAST(CAST(round(value * 1000) AS BIGINT) AS VARCHAR)
        |      ELSE event_type END AS raw
        |  FROM events
        |), lanes AS (
        |  SELECT event_type, vm,
        |    TRY_CAST(raw AS BIGINT) AS parsed,
        |    CASE WHEN vm > vm % 2 THEN NULL
        |      ELSE 9223372036854775807 - vm % 2 + vm END AS ov,
        |    CASE WHEN vm % 5 = 0 THEN NULL
        |      ELSE CAST(vm AS DOUBLE) / (vm % 5) END AS div_ok
        |  FROM ev)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(parsed) AS BIGINT) AS n_parsed,
        |  CAST(sum(parsed) AS BIGINT) AS s_parsed,
        |  CAST(sum(CASE WHEN ov IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overflow,
        |  CAST(count(div_ok) AS BIGINT) AS n_div_ok
        |FROM lanes GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "dq_table_checksum" ->
      """WITH rows_h AS (
        |  SELECT user_id % 16 AS shard,
        |    CAST(('0x' || substr(md5(
        |      event_id || '|' || user_id || '|' || event_type || '|'
        |        || CAST(round(value * 1000) AS BIGINT)),
        |      1, 15))::UBIGINT AS BIGINT) AS rh
        |  FROM events
        |), shards AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(bit_xor(rh) AS BIGINT) AS xor_h,
        |    CAST(SUM(rh % 1048576) AS BIGINT) AS sum_lo
        |  FROM rows_h GROUP BY shard
        |), total AS (
        |  SELECT CAST(-1 AS BIGINT) AS shard,
        |    CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |    CAST(bit_xor(xor_h) AS BIGINT) AS xor_h,
        |    CAST(SUM(sum_lo) AS BIGINT) AS sum_lo
        |  FROM shards)
        |SELECT shard, n_rows, xor_h, sum_lo FROM shards
        |UNION ALL SELECT shard, n_rows, xor_h, sum_lo FROM total
        |ORDER BY shard""".stripMargin,
    "mm_av_sync" ->
      (s"WITH kf0 AS (\n${Ext21Queries.oracle("mm_keyframes")}\n)" +
        """, kf AS (
        |  SELECT media_id, seg_no, key_frame AS f FROM kf0
        |), audio AS (
        |  SELECT media_id, f + (media_id % 7 - 3) AS a FROM kf
        |  UNION ALL
        |  SELECT media_id, f * 2 + 5 FROM kf WHERE seg_no % 3 = 1
        |), scored AS (
        |  SELECT au.media_id, l.lag, CAST(count(*) AS BIGINT)
        |    AS n_aligned
        |  FROM audio au
        |  CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) l
        |  JOIN kf ON kf.media_id = au.media_id
        |    AND kf.f = au.a + l.lag
        |  GROUP BY au.media_id, l.lag
        |), best AS (
        |  SELECT media_id, lag AS best_lag, n_aligned,
        |    ROW_NUMBER() OVER (PARTITION BY media_id
        |      ORDER BY n_aligned DESC, lag) AS rk
        |  FROM scored)
        |SELECT media_id, best_lag, n_aligned FROM best WHERE rk = 1
        |ORDER BY media_id""".stripMargin),
  )
}
