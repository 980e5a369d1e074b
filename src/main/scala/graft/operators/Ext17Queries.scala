package graft.operators

import graft.Tables.{registerAll, t}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 3: funnel latency distribution and the independence
  * audit.
  *
  *  - `ev_funnel_latency`: per funnel step (view→click,
  *    click→purchase), exact rank-selected latency percentiles
  *    (p50/p90 by the lower-rank rule, no interpolation — the
  *    engine-portable percentile_disc) over the same first-qualifying
  *    timestamps `ev_funnel` reports, so the two queries describe one
  *    funnel.
  *  - `dq_chi2_independence`: Pearson chi-square of source × lang on
  *    `documents` — the standard "is this column pair independent?"
  *    profiling test. The grid is DENSE (zero cells contribute
  *    (0−E)²/E — omitting them understates the statistic); the
  *    per-cell numerator O·N − R·C is exact BIGINT, the quotient runs
  *    in doubles with IDENTICAL expression text in both engines
  *    (IEEE mult/div are correctly rounded — the q62 discipline) and
  *    is then rounded to the micro lattice so the cross-cell SUM is
  *    integer and order-free.
  *
  * 100 TB shapes: funnel latency rides ev_funnel's per-user
  * min-aggregates (one shuffle per step on user_id), then ALL window
  * work runs per-step over the step-pair latency set with a single
  * (step, dt) sort; chi-square collapses the corpus to |sources| and
  * |langs| marginal tables plus one (source, lang) cell aggregate —
  * the dense grid is marginal×marginal (bounded domains, the
  * dq_t_closeness precedent), never corpus-sized.
  */
object Ext17Queries {

  // ---------------------------------------------------------------
  // ev_funnel_latency
  // ---------------------------------------------------------------

  /** Lower-rank percentile position: value at row
    * `(n − 1) · p div 100 + 1` of the ascending sort — exact,
    * interpolation-free, identical arithmetic in both engines.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    registerAll(spark, dir)
    val dts = spark.sql(
      """WITH e AS (
        |  SELECT user_id, event_type, ts div 1000 AS us FROM events
        |), v AS (
        |  SELECT user_id, MIN(us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(us) AS t_click
        |  FROM e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.us >= v.t_view
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(us) AS t_purchase
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= c.t_click
        |  GROUP BY e.user_id)
        |SELECT 'view_to_click' AS step, c.user_id,
        |  c.t_click - v.t_view AS dt_us
        |FROM c JOIN v ON v.user_id = c.user_id
        |UNION ALL
        |SELECT 'click_to_purchase' AS step, p.user_id,
        |  p.t_purchase - c.t_click AS dt_us
        |FROM p JOIN c ON c.user_id = p.user_id""".stripMargin)
    val wRank = Window.partitionBy("step")
      .orderBy(col("dt_us"), col("user_id"))
    val wStep = Window.partitionBy("step")
    dts
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wStep))
      .groupBy("step")
      .agg(max("n").as("n_pairs"),
        max(when(col("rn") === expr("(n - 1) * 50 div 100 + 1"),
          col("dt_us"))).as("p50_us"),
        max(when(col("rn") === expr("(n - 1) * 90 div 100 + 1"),
          col("dt_us"))).as("p90_us"),
        max("dt_us").as("max_us"))
      .orderBy("step")
  }

  // ---------------------------------------------------------------
  // dq_chi2_independence
  // ---------------------------------------------------------------

  /** Pearson chi-square of source × lang over documents, dense grid.
    * Per cell: O observed, E_micro = R·C·1e6 div N, contribution
    * round((O·N − R·C)² / (N·R·C) · 1e6) evaluated in doubles with
    * identical text both engines. chi2_micro (whole-set integer sum)
    * and df ride on every row.
    */
  def chi2Independence(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val srcT = docs.groupBy("source").agg(count(lit(1)).as("r_tot"))
      .withColumn("n_src", count(lit(1)).over(Window.partitionBy()))
    val langT = docs.groupBy("lang").agg(count(lit(1)).as("c_tot"))
      .withColumn("n_lang", count(lit(1)).over(Window.partitionBy()))
    val cells = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("o"))
    // dense grid = marginal × marginal (bounded domains), observed
    // cells joined in; missing cells are real zeros
    val grid = srcT.crossJoin(langT)
      .join(cells, Seq("source", "lang"), "left")
      .na.fill(0L, Seq("o"))
      .withColumn("n_tot",
        sum("o").over(Window.partitionBy()))
    grid
      .withColumn("num", col("o") * col("n_tot") - col("r_tot") * col("c_tot"))
      .withColumn("e_micro",
        expr("r_tot * c_tot * 1000000 div n_tot"))
      .withColumn("contrib_micro",
        round(col("num").cast("double") * col("num").cast("double")
          / col("n_tot").cast("double") / col("r_tot").cast("double")
          / col("c_tot").cast("double") * lit(1000000.0)).cast("long"))
      .withColumn("chi2_micro",
        sum("contrib_micro").over(Window.partitionBy()))
      .withColumn("df", (col("n_src") - 1) * (col("n_lang") - 1))
      .select("source", "lang", "o", "e_micro", "contrib_micro",
        "chi2_micro", "df")
      .orderBy("source", "lang")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_funnel_latency" -> funnelLatency _,
    "dq_chi2_independence" -> chi2Independence _,
  )

  def oracle: Map[String, String] = Map(
    "ev_funnel_latency" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), v AS (
        |  SELECT user_id, MIN(us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, MIN(us) AS t_click
        |  FROM e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.us >= v.t_view
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, MIN(us) AS t_purchase
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= c.t_click
        |  GROUP BY e.user_id
        |), dts AS (
        |  SELECT 'view_to_click' AS step, c.user_id,
        |    c.t_click - v.t_view AS dt_us
        |  FROM c JOIN v ON v.user_id = c.user_id
        |  UNION ALL
        |  SELECT 'click_to_purchase' AS step, p.user_id,
        |    p.t_purchase - c.t_click AS dt_us
        |  FROM p JOIN c ON c.user_id = p.user_id
        |), rk AS (
        |  SELECT step, dt_us,
        |    ROW_NUMBER() OVER (PARTITION BY step
        |      ORDER BY dt_us, user_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY step) AS n
        |  FROM dts)
        |SELECT step, MAX(n) AS n_pairs,
        |  MAX(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN dt_us END)
        |    AS p50_us,
        |  MAX(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN dt_us END)
        |    AS p90_us,
        |  MAX(dt_us) AS max_us
        |FROM rk GROUP BY step
        |ORDER BY step""".stripMargin,
    "dq_chi2_independence" ->
      """WITH srcs AS (
        |  SELECT source, COUNT(*) AS r_tot FROM documents GROUP BY 1
        |), langs AS (
        |  SELECT lang, COUNT(*) AS c_tot FROM documents GROUP BY 1
        |), cells AS (
        |  SELECT source, lang, COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2
        |), ns AS (SELECT COUNT(*) AS n_src FROM srcs),
        |nl AS (SELECT COUNT(*) AS n_lang FROM langs),
        |nt AS (SELECT COUNT(*) AS n_tot FROM documents),
        |grid AS (
        |  SELECT s.source, l.lang, s.r_tot, l.c_tot,
        |    COALESCE(c.o, 0) AS o
        |  FROM srcs s CROSS JOIN langs l
        |  LEFT JOIN cells c ON c.source = s.source AND c.lang = l.lang
        |), contrib AS (
        |  SELECT g.source, g.lang, CAST(g.o AS BIGINT) AS o,
        |    CAST((g.r_tot * g.c_tot * 1000000) // nt.n_tot AS BIGINT)
        |      AS e_micro,
        |    CAST(round(
        |      CAST(g.o * nt.n_tot - g.r_tot * g.c_tot AS DOUBLE)
        |        * CAST(g.o * nt.n_tot - g.r_tot * g.c_tot AS DOUBLE)
        |        / CAST(nt.n_tot AS DOUBLE) / CAST(g.r_tot AS DOUBLE)
        |        / CAST(g.c_tot AS DOUBLE) * 1000000.0) AS BIGINT)
        |      AS contrib_micro
        |  FROM grid g CROSS JOIN nt)
        |SELECT source, lang, o, e_micro, contrib_micro,
        |  CAST(SUM(contrib_micro) OVER () AS BIGINT) AS chi2_micro,
        |  CAST((ns.n_src - 1) * (nl.n_lang - 1) AS BIGINT) AS df
        |FROM contrib CROSS JOIN ns CROSS JOIN nl
        |ORDER BY source, lang""".stripMargin,
  )
}
