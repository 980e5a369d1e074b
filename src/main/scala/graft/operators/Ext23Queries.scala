package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 9: bounded-staleness enrichment and intra-document
  * script mixing.
  *
  *  - `q72_asof_tolerance`: as-of join with a STALENESS BOUND — each
  *    click matched to the most recent view of the same user, but
  *    only if it is at most 10 minutes old. The unbounded as-of
  *    (q14/q47) happily matches a week-old row; production
  *    enrichment almost always wants the tolerance. Composed as the
  *    planned band join (before=600, after=0) + one per-left rank —
  *    the band bound IS the tolerance, so no post-filter on age ever
  *    scans unmatched history.
  *  - `text_script_runs`: code-switching profile per document — the
  *    token stream mapped to script classes (alpha / digit / other),
  *    then run-length stats (runs, longest run, switch rate) via the
  *    standard islands trick on the exploded class sequence. The
  *    signal that separates prose from tables/code dumps at corpus
  *    scale.
  *
  * 100 TB shapes: the tolerance join inherits the band join's
  * contract (occupancy-bounded buffer, zero added exchange on
  * bucketed inputs) plus one conversion-keyed rank window; script
  * runs are one explode + two per-doc windows, partitioned by doc —
  * bounded by document length, no cross-doc shuffle at all.
  */
object Ext23Queries {

  // ---------------------------------------------------------------
  // q72_asof_tolerance
  // ---------------------------------------------------------------

  def asofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000").as("us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("vus"),
        col("event_id").as("vid"))
    val wBest = Window.partitionBy("event_id")
      .orderBy(col("vus").desc, col("vid"))
    graft.plans.PlannedBandJoin.bandJoin(clicks, views, Seq("user_id"),
        "us", "vus", before = 600L * 1000000L, after = 0L,
        payload = Seq("vid", "vus"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("us"),
        col("vid"), col("vus"), (col("us") - col("vus")).as("age_us"))
      .orderBy("user_id", "event_id")
  }

  // ---------------------------------------------------------------
  // text_script_runs
  // ---------------------------------------------------------------

  def scriptRuns(spark: SparkSession, dir: String): DataFrame = {
    val wSeq = Window.partitionBy("doc_id").orderBy("pos")
    val runs = t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text")))
          .as(Seq("pos", "tok")))
      .withColumn("c",
        when(col("tok").rlike("^[A-Za-z]+$"), "a")
          .when(col("tok").rlike("^[0-9]+$"), "d")
          .otherwise("o"))
      .withColumn("switch",
        when(lag("c", 1).over(wSeq).isNull ||
          lag("c", 1).over(wSeq) =!= col("c"), 1L).otherwise(0L))
      .withColumn("run_id", sum("switch").over(
        wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    runs.groupBy("doc_id", "run_id")
      .agg(count(lit(1)).as("rlen"))
      .groupBy("doc_id")
      .agg(sum("rlen").as("n_tokens"),
        max("run_id").as("n_runs"),
        max("rlen").as("longest_run"),
        expr("(max(run_id) - 1) * 1000000 div " +
          "greatest(sum(rlen) - 1, 1L)").as("switch_rate_micro"))
      .orderBy("doc_id")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_asof_tolerance" -> asofTolerance _,
    "text_script_runs" -> scriptRuns _,
  )

  def oracle: Map[String, String] = Map(
    "q72_asof_tolerance" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events
        |), clicks AS (
        |  SELECT user_id, event_id, us FROM ev
        |  WHERE event_type = 'click'
        |), views AS (
        |  SELECT user_id, us AS vus, event_id AS vid FROM ev
        |  WHERE event_type = 'view'
        |), j AS (
        |  SELECT c.user_id, c.event_id, c.us, v.vid, v.vus,
        |    ROW_NUMBER() OVER (PARTITION BY c.event_id
        |      ORDER BY v.vus DESC, v.vid) AS rn
        |  FROM clicks c JOIN views v
        |    ON v.user_id = c.user_id
        |    AND v.vus >= c.us - 600000000 AND v.vus <= c.us)
        |SELECT user_id, event_id, us, vid, vus, us - vus AS age_us
        |FROM j WHERE rn = 1
        |ORDER BY user_id, event_id""".stripMargin,
    "text_script_runs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), cls AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    CASE WHEN regexp_matches(tk[CAST(i AS INT) + 1],
        |        '^[A-Za-z]+$') THEN 'a'
        |      WHEN regexp_matches(tk[CAST(i AS INT) + 1],
        |        '^[0-9]+$') THEN 'd'
        |      ELSE 'o' END AS c
        |  FROM toks, UNNEST(range(0, len(tk))) AS r(i)
        |), sw AS (
        |  SELECT doc_id, pos, c,
        |    CASE WHEN lag(c) OVER w IS NULL OR lag(c) OVER w <> c
        |      THEN 1 ELSE 0 END AS switch
        |  FROM cls
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), runs AS (
        |  SELECT doc_id, pos, c,
        |    SUM(switch) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS run_id
        |  FROM sw
        |), rl AS (
        |  SELECT doc_id, run_id, COUNT(*) AS rlen
        |  FROM runs GROUP BY doc_id, run_id)
        |SELECT doc_id,
        |  CAST(SUM(rlen) AS BIGINT) AS n_tokens,
        |  CAST(MAX(run_id) AS BIGINT) AS n_runs,
        |  CAST(MAX(rlen) AS BIGINT) AS longest_run,
        |  ((CAST(MAX(run_id) AS BIGINT) - 1) * 1000000)
        |    // greatest(CAST(SUM(rlen) AS BIGINT) - 1, 1)
        |    AS switch_rate_micro
        |FROM rl GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
  )
}
