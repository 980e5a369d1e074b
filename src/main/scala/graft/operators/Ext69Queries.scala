package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 4: the autocorrelation spectrum and the fixed-size
  * mergeable corpus sample.
  *
  *  - `ts_acf`: per-type autocorrelation at lags 1..7 over the daily
  *    mean series — the seasonality detector proper (ts_ar1_fit is the
  *    lag-1 point; the weekly cadence shows as a lag-7 ridge). Exact
  *    integer lattice throughout: floor-mean daily values, centered by
  *    the floor mean-of-means, lag products summed as BIGINT, and the
  *    final ratio emitted via the signed pmod-floor division identity
  *    so Spark `div` and DuckDB `//` agree on negative numerators.
  *  - `sketch_bottomk_sample`: the bottom-k (min-wise) corpus sample —
  *    the R docs with the smallest deterministic md5 rank. Unlike a
  *    hash-rate split (text_hash_split), the sample size is FIXED at R
  *    whatever the corpus size, and it is MERGEABLE: bottom-k of a
  *    union == bottom-k of the concatenated per-shard bottom-k's (the
  *    KMV identity, proved in the spec) — so a 100 TB corpus sample is
  *    computed shard-local and merged with R rows per shard of traffic.
  *
  * 100 TB shapes: acf collapses |events| to |types|·|days| then to a
  * |types|·7 spectrum; bottom-k is a TakeOrderedAndProject (no global
  * sort) over one scan.
  */
object Ext69Queries {

  // ---------------------------------------------------------------
  // ts_acf
  // ---------------------------------------------------------------

  def acf(spark: SparkSession, dir: String): DataFrame = {
    // per-type daily floor means (the ar1 lattice, Ext56Queries.scala)
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day")
      .agg(expr("(sum(vm) - pmod(sum(vm), count(*))) div count(*)")
        .as("m"))
    val mbar = daily.groupBy("event_type")
      .agg(expr("(sum(m) - pmod(sum(m), count(*))) div count(*)")
        .as("mbar"))
    val c = daily.join(mbar, "event_type")
      .select(col("event_type"), col("day"),
        (col("m") - col("mbar")).as("c"))
    val den = c.groupBy("event_type")
      .agg(sum(col("c") * col("c")).as("den"))
    // each centered point fans out to its 7 lagged positions — a
    // bounded x7 explode over the tiny lattice, never over events
    val lagged = c
      .select(col("event_type"), col("c").as("c_prev"),
        explode(expr("sequence(1, 7)")).as("lag0"),
        col("day"))
      .select(col("event_type"), col("lag0").cast("long").as("lag"),
        (col("day") + col("lag0")).as("day"), col("c_prev"))
    c.join(lagged, Seq("event_type", "day"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c") * col("c_prev")).as("num"))
      .join(den, "event_type")
      .withColumn("acf_micro", expr(
        "(num * 1000000 - pmod(pmod(num * 1000000, den) + den, den))" +
          " div den"))
      .select("event_type", "lag", "n_pairs", "num", "den",
        "acf_micro")
      .orderBy("event_type", "lag")
  }

  // ---------------------------------------------------------------
  // sketch_bottomk_sample
  // ---------------------------------------------------------------

  val SampleR = 32

  /** The deterministic min-wise rank: first 15 md5 hex digits (60
    * bits) of "mws:<doc_id>" — BIGINT-safe on both engines.
    */
  def mwRank(id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("mws:"), id.cast("string"))),
      1, 15), 16, 10).cast("long")

  def bottomkSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        mwRank(col("doc_id")).as("h"))
    // sort-limit FIRST (TakeOrderedAndProject — per-partition heaps,
    // no global sort), then rank the R survivors; a global rank window
    // over the corpus would single-partition the whole table
    val top = ranked.orderBy(col("h"), col("doc_id")).limit(SampleR)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("h"), col("doc_id"))).cast("long"))
      .select("rank", "doc_id", "h", "lang", "n_chars")
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_acf" -> acf _,
    "sketch_bottomk_sample" -> bottomkSample _,
  )

  val oracle: Map[String, String] = Map(
    "ts_acf" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    (SUM(CAST(round(value * 1000) AS BIGINT))
        |      - ((SUM(CAST(round(value * 1000) AS BIGINT)) % count(*))
        |         + count(*)) % count(*)) // count(*) AS m
        |  FROM events GROUP BY 1, 2
        |), mbar AS (
        |  SELECT event_type,
        |    CAST((SUM(m) - ((SUM(m) % count(*)) + count(*)) % count(*))
        |      // count(*) AS BIGINT) AS mbar
        |  FROM daily GROUP BY 1
        |), c AS (
        |  SELECT d.event_type, d.day, CAST(d.m - b.mbar AS BIGINT) AS c
        |  FROM daily d JOIN mbar b ON b.event_type = d.event_type
        |), den AS (
        |  SELECT event_type, CAST(SUM(c * c) AS BIGINT) AS den
        |  FROM c GROUP BY 1
        |), lagged AS (
        |  SELECT event_type, lag, day + lag AS day, c AS c_prev
        |  FROM c, UNNEST(generate_series(1, 7)) AS g(lag)
        |), m AS (
        |  SELECT a.event_type, CAST(l.lag AS BIGINT) AS lag,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(a.c * l.c_prev) AS BIGINT) AS num
        |  FROM c a JOIN lagged l
        |    ON l.event_type = a.event_type AND l.day = a.day
        |  GROUP BY 1, 2
        |)
        |SELECT m.event_type, m.lag, m.n_pairs, m.num, d.den,
        |  CAST((m.num * 1000000
        |    - ((m.num * 1000000 % d.den) + d.den) % d.den) // d.den
        |    AS BIGINT) AS acf_micro
        |FROM m JOIN den d ON d.event_type = m.event_type
        |ORDER BY m.event_type, m.lag""".stripMargin,
    "sketch_bottomk_sample" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(('0x' || substr(md5('mws:' || doc_id), 1, 15))
        |      ::UBIGINT AS BIGINT) AS h
        |  FROM documents
        |)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT)
        |    AS rank,
        |  doc_id, h, lang, n_chars
        |FROM ranked
        |ORDER BY h, doc_id
        |LIMIT 32""".stripMargin,
  )
}
