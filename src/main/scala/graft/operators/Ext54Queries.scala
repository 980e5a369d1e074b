package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 17: KMV (theta-style) distinct sketches with set
  * algebra, schema-evolution union, and a Little's-law conservation
  * audit.
  *
  *  - `sketch_kmv_jaccard`: the k-minimum-values sketch (the theta
  *    sketch's core) — per day, the 64 smallest 52-bit hashes of the
  *    user set. Unlike HLL, KMV supports INTERSECTION estimates:
  *    for adjacent days, the union sketch is the 64 smallest of the
  *    two sketches' union (an exact identity, asserted in the spec),
  *    the union-size estimate is `63·2^52 div θ`, and Jaccard is the
  *    fraction of union-sketch members present in both sides. The
  *    exact Jaccard rides along, so the estimate is auditable.
  *  - `q83_union_by_name`: `unionByName(allowMissingColumns)` — the
  *    schema-evolution union an ingest pipeline runs when v2 rows
  *    grow a column v1 rows lack; missing columns null-fill, and the
  *    aggregate distinguishes absent from zero. Oracle:
  *    `UNION ALL BY NAME`.
  *  - `ev_littles_law`: the conservation law behind concurrency
  *    dashboards — the time integral of concurrent-session count
  *    equals the sum of session durations, EXACTLY, over a closed
  *    horizon. Both sides compute independently (boundary sweep vs
  *    per-session sum) in integer microseconds; the derived
  *    L = λ·W diagnostics ride along in micro units.
  *
  * 100 TB shapes: KMV is a per-day top-k-by-hash (WindowGroupLimit,
  * 64 rows out per day regardless of input); the union is an
  * |days|·128-row merge. The schema union is two narrow scans glued
  * without shuffle. The sweep is one window over ±1 boundaries per
  * session — 2 rows per session, not per event; the prefix sum over
  * them is the classic two-phase scan at cluster scale (per-shard
  * partials + carry), which local[32] instantiates as one ordered
  * pass over the already-50×-reduced session table.
  */
object Ext54Queries {

  // ---------------------------------------------------------------
  // sketch_kmv_jaccard
  // ---------------------------------------------------------------

  private val KmvK = 64

  /** 52-bit user hash — identical text in the DuckDB oracle. */
  private def uh: Column =
    conv(substring(md5(concat(lit("kmv:"),
      col("user_id").cast("string"))), 1, 13), 16, 10).cast("long")

  def kmvJaccard(spark: SparkSession, dir: String): DataFrame = {
    val du = t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id")).distinct()
      .withColumn("h", uh)
    val wDay = Window.partitionBy("day").orderBy("h")
    val kmv = du
      .withColumn("rk", row_number().over(wDay))
      .filter(col("rk") <= KmvK)
      .select("day", "h").cache()
    val pairsOfDays = kmv.select(col("day")).distinct()
      .withColumn("next_day", col("day") + 1)
      .join(kmv.select(col("day").as("next_day")).distinct(),
        "next_day")
    // union sketch = k smallest of the two sketches' union (set
    // union on h — the same user hashes identically on both days)
    val unionH = pairsOfDays
      .join(kmv, "day")
      .select(col("day"), col("next_day"), col("h"))
      .unionByName(pairsOfDays
        .join(kmv.select(col("day").as("next_day"), col("h")),
          "next_day")
        .select(col("day"), col("next_day"), col("h")))
      .distinct()
    val wPair = Window.partitionBy("day", "next_day").orderBy("h")
    val unionKmv = unionH
      .withColumn("rk", row_number().over(wPair))
      .filter(col("rk") <= KmvK)
    val inA = kmv.select(col("day"), col("h"), lit(1).as("in_a"))
    val inB = kmv.select(col("day").as("next_day"), col("h"),
      lit(1).as("in_b"))
    val sketchEst = unionKmv
      .join(inA, Seq("day", "h"), "left")
      .join(inB, Seq("next_day", "h"), "left")
      .groupBy("day", "next_day")
      .agg(max("h").as("theta"), count(lit(1)).as("k_used"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("n_common"))
      .withColumn("est_union",
        expr(s"(${KmvK - 1} * ${1L << 52}) div theta"))
      .withColumn("jacc_est_micro",
        expr("n_common * 1000000 div k_used"))
    // exact |A∩B| / |A∪B| per adjacent pair, integer micro — the
    // audit column the estimate is judged against
    val days = t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id")).distinct()
    val a = days.select(col("day"), col("user_id"))
    val b = days.select((col("day") - 1).as("day"), col("user_id"))
    val inter = a.join(b, Seq("day", "user_id"))
      .groupBy("day").agg(count(lit(1)).as("n_inter"))
    val uni = a.unionByName(b).distinct()
      .groupBy("day").agg(count(lit(1)).as("n_union"))
    val exactPair = uni.join(inter, Seq("day"), "left")
      .na.fill(0L, Seq("n_inter"))
      .withColumn("jacc_exact_micro",
        expr("n_inter * 1000000 div n_union"))
      .select(col("day"), col("jacc_exact_micro"))
    sketchEst
      .join(exactPair, "day")
      .select("day", "next_day", "theta", "n_common", "est_union",
        "jacc_est_micro", "jacc_exact_micro")
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // q83_union_by_name
  // ---------------------------------------------------------------

  def unionByNameEvolution(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    // v1 rows: no score column; v2 rows (every third) grew one
    val v1 = ev.filter(col("event_id") % 3 =!= 0)
      .select(col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val v2 = ev.filter(col("event_id") % 3 === 0)
      .select(col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"),
        (col("event_id") % 997).as("score"))
    v1.unionByName(v2, allowMissingColumns = true)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        count(col("score")).as("n_scored"), // absent ≠ zero
        sum("score").as("s_score"),
        sum("vm").as("s_vm"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // ev_littles_law
  // ---------------------------------------------------------------

  def littlesLaw(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("tu"),
        col("event_id"))
    val wU = Window.partitionBy("user_id").orderBy("tu", "event_id")
    val sess = ev
      .withColumn("new_sess",
        when(col("tu") - lag("tu", 1).over(wU) > 1800000000L
          || lag("tu", 1).over(wU).isNull, 1L).otherwise(0L))
      .withColumn("sess", sum("new_sess").over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess")
      .agg(min("tu").as("s_start"), max("tu").as("s_end"))
      .cache()
    val bounds = sess.select(col("s_start").as("t"), lit(1L).as("d"))
      .unionByName(sess.select(col("s_end").as("t"), lit(-1L).as("d")))
      .groupBy("t").agg(sum("d").as("d"))
      // the two-level sweep below reads this three times (in-bucket
      // ranks, per-bucket totals) — one materialization
      .cache()
    // Concurrency sweep as a PARTITIONED two-pass prefix sum (round-7
    // verdict ask #4: the old `Window.orderBy("t")` ran every session
    // boundary in the corpus through ONE task). Level 1: boundaries
    // bucket by hour; running sums and the next-boundary lead stay
    // inside each hour's partition. Level 2: per-hour delta totals and
    // min timestamps — a table bounded by the HORIZON (hours of data,
    // not rows: 100 TB of one year is still ~8.8k buckets) — carry the
    // cross-bucket offsets and the lead fallback through one bounded
    // window, broadcast back. Identical arithmetic to the global scan:
    // conc(t) = offset(bucket) + running-in-bucket, dt bridges bucket
    // boundaries via the next bucket's first t.
    val hourUs = 3600000000L
    val wB = Window.partitionBy("b").orderBy("t")
    val inBucket = bounds
      .withColumn("b", expr(s"t div ${hourUs}L"))
      .withColumn("run_in_b", sum("d").over(
        wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("lead_in_b", lead("t", 1).over(wB))
    val wBk = Window.orderBy("b") // horizon-bounded: one row per hour
    val bucketOff = bounds
      .withColumn("b", expr(s"t div ${hourUs}L"))
      .groupBy("b")
      .agg(sum("d").as("d_tot"), min("t").as("t_min"))
      .withColumn("off", coalesce(sum("d_tot").over(
        wBk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("next_min", lead("t_min", 1).over(wBk))
      .select("b", "off", "next_min")
    val sweep = inBucket
      .join(broadcast(bucketOff), "b")
      .withColumn("conc", col("off") + col("run_in_b"))
      .withColumn("dt",
        coalesce(col("lead_in_b"), col("next_min")) - col("t"))
      .filter(col("dt").isNotNull)
      .agg(sum(col("conc") * col("dt")).as("integral_us"))
    val perSess = sess.agg(count(lit(1)).as("n_sessions"),
      sum(col("s_end") - col("s_start")).as("sum_dur_us"),
      min("s_start").as("h_start"), max("s_end").as("h_end"))
    perSess.crossJoin(sweep)
      .withColumn("horizon_us", col("h_end") - col("h_start"))
      .withColumn("conc_avg_micro",
        expr("integral_us * 1000000 div horizon_us"))
      .select("n_sessions", "sum_dur_us", "integral_us", "horizon_us",
        "conc_avg_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_kmv_jaccard" -> kmvJaccard _,
    "q83_union_by_name" -> unionByNameEvolution _,
    "ev_littles_law" -> littlesLaw _,
  )

  val oracle: Map[String, String] = Map(
    "sketch_kmv_jaccard" ->
      s"""WITH du AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day,
        |    user_id
        |  FROM events
        |), hashed AS (
        |  SELECT day, user_id,
        |    CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)),
        |      1, 13))::UBIGINT AS BIGINT) AS h
        |  FROM du
        |), kmv AS (
        |  SELECT day, h FROM (
        |    SELECT day, h, ROW_NUMBER() OVER (PARTITION BY day
        |      ORDER BY h) AS rk
        |    FROM hashed) WHERE rk <= $KmvK
        |), pairs AS (
        |  SELECT a.day, a.day + 1 AS next_day
        |  FROM (SELECT DISTINCT day FROM kmv) a
        |  JOIN (SELECT DISTINCT day FROM kmv) b ON b.day = a.day + 1
        |), uh AS (
        |  SELECT DISTINCT p.day, p.next_day, k.h
        |  FROM pairs p JOIN kmv k
        |    ON k.day = p.day OR k.day = p.next_day
        |), ukmv AS (
        |  SELECT day, next_day, h FROM (
        |    SELECT day, next_day, h, ROW_NUMBER() OVER (
        |      PARTITION BY day, next_day ORDER BY h) AS rk
        |    FROM uh) WHERE rk <= $KmvK
        |), est AS (
        |  SELECT u.day, u.next_day, MAX(u.h) AS theta,
        |    CAST(count(*) AS BIGINT) AS k_used,
        |    CAST(SUM(CASE WHEN ka.h IS NOT NULL AND kb.h IS NOT NULL
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_common
        |  FROM ukmv u
        |  LEFT JOIN kmv ka ON ka.day = u.day AND ka.h = u.h
        |  LEFT JOIN kmv kb ON kb.day = u.next_day AND kb.h = u.h
        |  GROUP BY u.day, u.next_day
        |), inter AS (
        |  SELECT a.day, CAST(count(*) AS BIGINT) AS n_inter
        |  FROM du a JOIN du b ON b.day = a.day + 1
        |    AND b.user_id = a.user_id
        |  GROUP BY a.day
        |), uni AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
        |    AS n_union
        |  FROM (SELECT day, user_id FROM du
        |    UNION ALL SELECT day - 1, user_id FROM du)
        |  GROUP BY day
        |)
        |SELECT e.day, e.next_day, e.theta, e.n_common,
        |  CAST((${KmvK - 1} * ${1L << 52}) // e.theta AS BIGINT)
        |    AS est_union,
        |  CAST(e.n_common * 1000000 // e.k_used AS BIGINT)
        |    AS jacc_est_micro,
        |  CAST(COALESCE(i.n_inter, 0) * 1000000 // un.n_union
        |    AS BIGINT) AS jacc_exact_micro
        |FROM est e
        |JOIN uni un ON un.day = e.day
        |LEFT JOIN inter i ON i.day = e.day
        |ORDER BY e.day""".stripMargin,
    "q83_union_by_name" ->
      """WITH unioned AS (
        |  SELECT user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events WHERE event_id % 3 <> 0
        |  UNION ALL BY NAME
        |  SELECT user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    event_id % 997 AS score
        |  FROM events WHERE event_id % 3 = 0
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(score) AS BIGINT) AS n_scored,
        |  CAST(sum(score) AS BIGINT) AS s_score,
        |  CAST(sum(vm) AS BIGINT) AS s_vm
        |FROM unioned GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "ev_littles_law" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tu, event_id FROM events
        |), s AS (
        |  SELECT user_id, tu, event_id,
        |    CASE WHEN lag(tu) OVER w IS NULL
        |           OR tu - lag(tu) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
        |), s2 AS (
        |  SELECT user_id, tu,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY tu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM s
        |), sess AS (
        |  SELECT user_id, sess, MIN(tu) AS s_start, MAX(tu) AS s_end
        |  FROM s2 GROUP BY user_id, sess
        |), bounds AS (
        |  SELECT t, CAST(SUM(d) AS BIGINT) AS d FROM (
        |    SELECT s_start AS t, 1 AS d FROM sess
        |    UNION ALL SELECT s_end, -1 FROM sess)
        |  GROUP BY t
        |), sweep AS (
        |  SELECT CAST(SUM(conc * dt) AS BIGINT) AS integral_us FROM (
        |    SELECT SUM(d) OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS conc,
        |      lead(t) OVER (ORDER BY t) - t AS dt
        |    FROM bounds)
        |  WHERE dt IS NOT NULL
        |), per AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |    CAST(SUM(s_end - s_start) AS BIGINT) AS sum_dur_us,
        |    MIN(s_start) AS h_start, MAX(s_end) AS h_end
        |  FROM sess)
        |SELECT per.n_sessions, per.sum_dur_us, sweep.integral_us,
        |  per.h_end - per.h_start AS horizon_us,
        |  CAST(sweep.integral_us * 1000000
        |    // (per.h_end - per.h_start) AS BIGINT) AS conc_avg_micro
        |FROM per CROSS JOIN sweep""".stripMargin,
  )
}
