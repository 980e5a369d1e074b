package graft.operators

import java.util.concurrent.ConcurrentHashMap

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 batch 7: survival analysis and schema-evolution scans.
  *
  *  - `ev_survival_km`: the Kaplan–Meier estimator over
  *    repeat-purchase time — per user, days from first to second
  *    purchase, right-censored at the corpus horizon for one-purchase
  *    users. The survival curve every retention model calibrates
  *    against, exact: the at-risk counts are a descending cumulative
  *    sum over the ≤|days| duration lattice, and the product-limit
  *    fold runs in integer micro with one floor division per event
  *    time (km' = km·(n−d) div n), replicated in DuckDB as a
  *    recursive CTE — the ts_holt fold discipline.
  *  - `src_parquet_schema_merge`: two parquet generations in ONE
  *    directory (gen2 adds a `score` column), read back with
  *    mergeSchema — the lakehouse schema-evolution scan. Old rows
  *    surface null score; the aggregate proves both generations
  *    survived with their columns aligned by name.
  *
  * 100 TB shapes: KM collapses |events| to per-user durations (one
  * groupBy) then to the ≤|days| lattice; the fold is constant-size.
  * The merge scan stays splittable per file — schema merge is a
  * footer operation, not a data rewrite.
  */
object Ext72Queries {

  // ---------------------------------------------------------------
  // ev_survival_km
  // ---------------------------------------------------------------

  def survivalKm(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("datediff(timestamp_micros(ts div 1000)," +
          " date'2024-01-01')").cast("long").as("day"))
    val horizon = broadcast(p.agg(max("day").as("hz")))
    // per user: first purchase day, and the first one AFTER it
    val fs = p.groupBy("user_id").agg(min("day").as("d1"))
    val second = p.join(fs, Seq("user_id"))
      .filter(col("day") > col("d1"))
      .groupBy("user_id").agg(min("day").as("d2"))
    val dur = fs.join(second, Seq("user_id"), "left")
      .crossJoin(horizon)
      .select(
        when(col("d2").isNotNull, col("d2") - col("d1"))
          .otherwise(col("hz") - col("d1")).as("tt"),
        when(col("d2").isNotNull, lit(1L)).otherwise(lit(0L))
          .as("ev"))
    // duration lattice: events d_t and censorings c_t per time, then
    // at-risk n_t = sum of everything at-or-after t (descending
    // cumulative)
    val lat = dur.groupBy("tt")
      .agg(sum("ev").as("d"),
        sum(lit(1L) - col("ev")).as("c"))
    // bounded domain: `lat` is one row per distinct DAY-valued
    // duration — horizon-bounded (days of data), not corpus-sized
    val wDesc = Window.orderBy(col("tt").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = lat
      .withColumn("n", sum(col("d") + col("c")).over(wDesc))
      .filter(col("d") > 0) // KM steps only at event times
    // product-limit fold in integer micro over the packed lattice
    val packed = risk
      .agg(array_sort(collect_list(struct(col("tt"), col("n"),
        col("d")))).as("s"))
    val folded = packed.select(explode(expr(
      """aggregate(s,
        |  named_struct('km', cast(1000000 as bigint),
        |    'out', cast(array() as
        |      array<struct<tt:bigint,n:bigint,d:bigint,km:bigint>>)),
        |  (acc, x) -> named_struct(
        |    'km', acc.km * (x.n - x.d) div x.n,
        |    'out', array_append(acc.out, named_struct(
        |      'tt', x.tt, 'n', x.n, 'd', x.d,
        |      'km', acc.km * (x.n - x.d) div x.n))),
        |  acc -> acc.out)""".stripMargin)).as("r"))
    folded.select(col("r.tt").as("tt"), col("r.n").as("n_at_risk"),
      col("r.d").as("d_events"), col("r.km").as("km_micro"))
      .orderBy("tt")
  }

  // ---------------------------------------------------------------
  // src_parquet_schema_merge
  // ---------------------------------------------------------------

  private val written = new ConcurrentHashMap[String, String]()

  /** Two parquet generations under one directory, written once per
    * JVM per dir: gen1 = even event_ids without `score`, gen2 = odd
    * event_ids with it.
    */
  private def materialize(spark: SparkSession, dir: String): String =
    written.computeIfAbsent(dir, _ => {
      val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        s"graft-sm-${ProcessHandle.current().pid()}-" +
          Integer.toHexString(dir.hashCode)).toString
      val src = t(spark, dir, "events").select(col("event_id"),
        col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      src.filter(col("event_id") % 2 === 0)
        .select("event_id", "event_type", "vm")
        .write.mode("overwrite").parquet(p)
      src.filter(col("event_id") % 2 === 1)
        .withColumn("score", col("event_id") % 97)
        .write.mode("append").parquet(p)
      p
    })

  def schemaMerge(spark: SparkSession, dir: String): DataFrame = {
    val path = materialize(spark, dir)
    spark.read.option("mergeSchema", "true").parquet(path)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("vm").as("s_milli"),
        sum(when(col("score").isNull, 1L).otherwise(0L))
          .as("n_gen1"),
        sum(coalesce(col("score"), lit(0L))).as("s_score"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_survival_km" -> survivalKm _,
    "src_parquet_schema_merge" -> schemaMerge _,
  )

  val oracle: Map[String, String] = Map(
    "ev_survival_km" ->
      """WITH RECURSIVE p AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day
        |  FROM events WHERE event_type = 'purchase'
        |), hz AS (SELECT MAX(day) AS hz FROM p),
        |fs AS (SELECT user_id, MIN(day) AS d1 FROM p GROUP BY 1),
        |scnd AS (
        |  SELECT p.user_id, MIN(p.day) AS d2
        |  FROM p JOIN fs ON fs.user_id = p.user_id
        |  WHERE p.day > fs.d1 GROUP BY 1
        |), dur AS (
        |  SELECT CASE WHEN s.d2 IS NOT NULL THEN s.d2 - f.d1
        |    ELSE h.hz - f.d1 END AS tt,
        |    CASE WHEN s.d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM fs f LEFT JOIN scnd s ON s.user_id = f.user_id
        |  CROSS JOIN hz h
        |), lat AS (
        |  SELECT tt, CAST(SUM(ev) AS BIGINT) AS d,
        |    CAST(SUM(1 - ev) AS BIGINT) AS c
        |  FROM dur GROUP BY tt
        |), risk AS (
        |  SELECT tt, d,
        |    CAST(SUM(d + c) OVER (ORDER BY tt DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n
        |  FROM lat
        |), steps AS (
        |  SELECT tt, n, d, ROW_NUMBER() OVER (ORDER BY tt) AS k
        |  FROM risk WHERE d > 0
        |), km AS (
        |  SELECT k, tt, n, d,
        |    CAST(1000000 * (n - d) // n AS BIGINT) AS km
        |  FROM steps WHERE k = 1
        |  UNION ALL
        |  SELECT s.k, s.tt, s.n, s.d,
        |    CAST(km.km * (s.n - s.d) // s.n AS BIGINT) AS km
        |  FROM km JOIN steps s ON s.k = km.k + 1
        |)
        |SELECT tt, n AS n_at_risk, d AS d_events, km AS km_micro
        |FROM km ORDER BY tt""".stripMargin,
    "src_parquet_schema_merge" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS s_milli,
        |  CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_gen1,
        |  CAST(SUM(CASE WHEN event_id % 2 = 1 THEN event_id % 97
        |    ELSE 0 END) AS BIGINT) AS s_score
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
