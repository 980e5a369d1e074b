package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 9: correlated scalar subqueries, offset-gap
  * auditing, and inter-arrival distributions.
  *
  *  - `q78_scalar_subquery`: the correlated SCALAR subquery surface
  *    (a per-row aggregate subquery in WHERE) — Catalyst decorrelates
  *    it to a join against the per-group aggregate; the spec asserts
  *    no per-row re-execution survives in the plan.
  *  - `cdc_gap_audit`: missing-sequence detection per topic
  *    partition — consecutive offsets per partition should be dense;
  *    a gap is a dropped or still-in-flight message. Reports per
  *    partition: messages, gaps, missing count, widest gap. The
  *    at-least-once audit cdc_redelivery_audit (duplicates) does not
  *    cover (losses).
  *  - `ev_interarrival_hist`: log2-bucketed per-user inter-event gap
  *    histogram — the traffic-shape fingerprint (bursty vs uniform)
  *    that sizes session timeouts and stream watermarks. One lag
  *    window per user, then a ≤64-cell rollup.
  *
  * 100 TB shapes: the scalar subquery decorrelates to a broadcast
  * of |nations| aggregates; the gap audit is one lag window per
  * partition (sorted within partition — the shuffle is on the
  * partition key); the histogram collapses map-side to bucket cells.
  */
object Ext46Queries {

  // ---------------------------------------------------------------
  // q78_scalar_subquery
  // ---------------------------------------------------------------

  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c.c_nationkey AS nationkey,
        |  CAST(count(*) AS BIGINT) AS n_above_avg,
        |  CAST(min(c.c_custkey) AS BIGINT) AS min_custkey
        |FROM customer c
        |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > (
        |  SELECT (sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        |      - pmod(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)),
        |        count(*))) div count(*)
        |  FROM customer c2
        |  WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY c.c_nationkey
        |ORDER BY nationkey""".stripMargin)
  }

  // ---------------------------------------------------------------
  // cdc_gap_audit
  // ---------------------------------------------------------------

  /** Offsets = per-partition (user_id % 16) arrival ranks of
    * event_id; the "lost" messages are simulated by dropping
    * event_id % 23 == 0 AFTER offsets are assigned — exactly how a
    * real gap presents: the offset sequence the consumer sees skips
    * the dropped slots.
    */
  def gapAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select((col("user_id") % 16).as("part"), col("event_id"))
    val wPart = Window.partitionBy("part").orderBy("event_id")
    val withOffsets = ev
      .withColumn("offset", row_number().over(wPart).cast("long"))
      .filter(col("event_id") % 23 =!= 0) // the lost slots
    val wSeen = Window.partitionBy("part").orderBy("offset")
    withOffsets
      .withColumn("prev_off", lag("offset", 1).over(wSeen))
      .withColumn("gap",
        when(col("prev_off").isNotNull,
          col("offset") - col("prev_off") - 1).otherwise(lit(0L)))
      .groupBy("part")
      .agg(count(lit(1)).as("n_msgs"),
        sum(when(col("gap") > 0, 1L).otherwise(0L)).as("n_gaps"),
        sum("gap").as("n_missing"),
        max("gap").as("max_gap"))
      .orderBy("part")
  }

  // ---------------------------------------------------------------
  // ev_interarrival_hist
  // ---------------------------------------------------------------

  def interarrivalHist(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 1000000000").as("tsec"),
        col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("tsec", "event_id")
    ev.withColumn("prev", lag("tsec", 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_sec", col("tsec") - col("prev"))
      // bucket = floor(log2(gap+1)): 0s->0, 1s->1, 2-3->2, ...
      // integer log2 via binary-string length: exact at power-of-2
      // boundaries where float log2 could floor wrong
      .withColumn("bucket",
        expr("cast(length(conv(gap_sec + 1, 10, 2)) - 1 as bigint)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_sec").as("min_sec"),
        max("gap_sec").as("max_sec"))
      .withColumn("share_micro",
        expr("n_gaps * 1000000 div sum(n_gaps) over ()"))
      .select("bucket", "n_gaps", "min_sec", "max_sec", "share_micro")
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_scalar_subquery" -> scalarSubquery _,
    "cdc_gap_audit" -> gapAudit _,
    "ev_interarrival_hist" -> interarrivalHist _,
  )

  val oracle: Map[String, String] = Map(
    "q78_scalar_subquery" ->
      """SELECT c.c_nationkey AS nationkey,
        |  CAST(count(*) AS BIGINT) AS n_above_avg,
        |  CAST(min(c.c_custkey) AS BIGINT) AS min_custkey
        |FROM customer c
        |WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > (
        |  SELECT (s - ((s % n) + n) % n) // n FROM (
        |    SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        |        AS BIGINT) AS s,
        |      CAST(count(*) AS BIGINT) AS n
        |    FROM customer c2
        |    WHERE c2.c_nationkey = c.c_nationkey))
        |GROUP BY c.c_nationkey
        |ORDER BY nationkey""".stripMargin,
    "cdc_gap_audit" ->
      """WITH ev AS (
        |  SELECT user_id % 16 AS part, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id % 16
        |      ORDER BY event_id) AS BIGINT) AS "offset"
        |  FROM events
        |), seen AS (
        |  SELECT part, "offset",
        |    lag("offset") OVER (PARTITION BY part
        |      ORDER BY "offset") AS prev_off
        |  FROM ev WHERE event_id % 23 <> 0
        |), gaps AS (
        |  SELECT part,
        |    CASE WHEN prev_off IS NOT NULL
        |      THEN "offset" - prev_off - 1 ELSE 0 END AS gap
        |  FROM seen)
        |SELECT CAST(part AS BIGINT) AS part,
        |  CAST(count(*) AS BIGINT) AS n_msgs,
        |  CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS n_missing,
        |  CAST(max(gap) AS BIGINT) AS max_gap
        |FROM gaps GROUP BY part
        |ORDER BY part""".stripMargin,
    "ev_interarrival_hist" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    event_id
        |  FROM events
        |), g AS (
        |  SELECT tsec - lag(tsec) OVER (PARTITION BY user_id
        |    ORDER BY tsec, event_id) AS gap_sec
        |  FROM ev
        |), b AS (
        |  SELECT gap_sec,
        |    CAST(length(bin(gap_sec + 1)) - 1 AS BIGINT) AS bucket
        |  FROM g WHERE gap_sec IS NOT NULL
        |), agg AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(min(gap_sec) AS BIGINT) AS min_sec,
        |    CAST(max(gap_sec) AS BIGINT) AS max_sec
        |  FROM b GROUP BY bucket)
        |SELECT bucket, n_gaps, min_sec, max_sec,
        |  CAST(n_gaps * 1000000 // (SELECT sum(n_gaps) FROM agg)
        |    AS BIGINT) AS share_micro
        |FROM agg ORDER BY bucket""".stripMargin,
  )
}
