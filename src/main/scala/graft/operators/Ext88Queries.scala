package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 batch: the agreement-kit closer and the seasonal
  * smoother the round-11 triage parked.
  *
  *  - `eval_cochran_q`: Cochran's Q — the k-judge PAIRED binary
  *    agreement test the krippendorff/fleiss family still lacked.
  *    Fleiss' kappa measures HOW MUCH the judges agree; Cochran's Q
  *    tests whether the judges have the SAME marginal pass rate on
  *    the same documents (the null an LLM-judge ensemble audit
  *    actually cares about: is judge 2 systematically stricter?).
  *    Runs over the identical three-judge panel as
  *    `eval_fleiss_kappa` (Ext84Queries.judgeVotes) so the two
  *    statistics read the same ballots.
  *  - `ts_holt_winters_seasonal`: additive triple-exponential
  *    smoothing (level + trend + weekly seasonal) over the daily
  *    series — the round-11 triage survivor, unblocked by carrying
  *    the fold state as the output array itself (s_{t−7} is just
  *    element_at(acc, -7)) instead of a rolling seasonal vector,
  *    which keeps the expression depth at ~ts_holt levels.
  */
object Ext88Queries {

  // ---------------------------------------------------------------
  // eval_cochran_q
  // ---------------------------------------------------------------

  /** Cochran's Q for k = 3 binary raters:
    *
    *   Q = (k−1)·(k·ΣⱼGⱼ² − N²) / (k·N − ΣᵢLᵢ²)
    *
    * with Gⱼ = judge j's pass count, Lᵢ = row (document) vote total,
    * N = ΣGⱼ = ΣLᵢ. Under H₀ (equal judge marginals) Q ~ χ²(k−1);
    * `q_flag` marks the 5% critical point for df = 2 (5.991).
    * The denominator has a closed per-item form: 3L − L² is 0 for
    * unanimous items (L ∈ {0,3}) and 2 for splits (L ∈ {1,2}), so
    * k·N − ΣL² = 2·n_splits exactly — Q is driven ONLY by items the
    * judges disagree on, which is why `n_splits` is surfaced.
    *
    * Parity/overflow discipline: the corpus collapses to ONE row of
    * exact BIGINT moments (counts, three judge totals, ΣL, ΣL²); the
    * statistic itself is SCALAR double arithmetic on those integers
    * — no double ever enters a SUM, so there is no summation-order
    * hazard (the ev_srm chi² pattern, Ext87Queries.scala), and
    * squaring in doubles instead of BIGINT avoids the Gⱼ² overflow
    * that capped the earlier exact-integer fleiss form (round-9
    * ADVICE lesson): valid to any corpus size at test-statistic
    * precision.
    *
    * 100 TB shape: one corpus pass (the tokenizer shared with the
    * fleiss entry) into a 1-row moment aggregate; Q is arithmetic on
    * that row.
    */
  def cochranQ(spark: SparkSession, dir: String): DataFrame =
    Ext84Queries.judgeVotes(spark, dir)
      .agg(count(lit(1)).as("n_docs"),
        sum("j1").as("g1"), sum("j2").as("g2"), sum("j3").as("g3"),
        sum("n1").as("nn"), sum(expr("n1 * n1")).as("b"))
      .withColumn("n_splits", expr("(3 * nn - b) div 2"))
      .withColumn("q_micro", expr(
        "cast(round(2.0d * (3.0d * (cast(g1 as double) * cast(g1 as double)" +
          " + cast(g2 as double) * cast(g2 as double)" +
          " + cast(g3 as double) * cast(g3 as double))" +
          " - cast(nn as double) * cast(nn as double))" +
          " / cast(greatest(3 * nn - b, 1) as double) * 1e6) as bigint)"))
      .withColumn("q_flag", (col("q_micro") > 5991000L).cast("int"))
      .select("n_docs", "g1", "g2", "g3", "n_splits", "q_micro",
        "q_flag")

  // ---------------------------------------------------------------
  // ts_holt_winters_seasonal
  // ---------------------------------------------------------------

  /** Additive Holt–Winters (triple-exponential) smoothing with
    * α = β = γ = 1/2 and weekly period m = 7 over the daily
    * event-value series (`Ext13Queries.dailySeries`, the ts_holt /
    * ts_backtest_snaive lattice and lag-7 convention):
    *
    *   l_t = ⌊(y_t − s_{t−7} + l_{t−1} + b_{t−1}) / 2⌋
    *   b_t = ⌊(l_t − l_{t−1} + b_{t−1}) / 2⌋
    *   s_t = ⌊(y_t − l_t + s_{t−7}) / 2⌋
    *
    * seeded on the first 7 days: l = ⌊mean⌋, b = 0, s_i = y_i − l
    * (so the seed block's one-step fit is exactly y_i). `forecast`
    * is the one-step-ahead prediction l_{t−1} + b_{t−1} + s_{t−7} —
    * the number a seasonal-aware anomaly monitor compares y_t
    * against (ts_backtest_snaive without the "trend is zero"
    * assumption, ts_holt without the "no seasonality" assumption).
    *
    * Expression-depth budget (the feasibility gate this entry was
    * parked on in round 11): the fold state is the OUT ARRAY itself
    * — l_{t−1}/b_{t−1} are element_at(acc, -1) fields and s_{t−7} is
    * element_at(acc, -7).seasonal (the seed block primes the first
    * seven) — so the only repeated subtree is the new level (5
    * inline copies), versus the rolling-seasonal-vector formulation
    * whose level/trend/seasonal-array updates each re-expand the
    * full state transition. All divisions are pmod-floored; every
    * value stays an exact BIGINT on the 1e-3 lattice, so parity
    * with the oracle's nested-subquery recursive CTE is structural.
    *
    * 100 TB shape: identical to ts_holt — the corpus collapses to
    * one row per day first; the inherently sequential recursion runs
    * over the |days|-bounded packed array, never the corpus. For
    * millions of independent series the same lambda runs per group
    * after a groupBy-collect bounded by series length.
    */
  def holtWinters(spark: SparkSession, dir: String): DataFrame = {
    val packed = Ext13Queries.dailySeries(spark, dir)
      .agg(array_sort(collect_list(struct(col("day"), col("v_day"))))
        .as("s"))
      // seed level: floor-mean of the first 7 days (non-negative
      // sums here, but pmod-floor keeps the lattice rule uniform)
      .withColumn("l0", expr(
        """(aggregate(slice(s, 1, 7), cast(0 as bigint),
          |   (a, e) -> a + e.v_day)
          | - pmod(aggregate(slice(s, 1, 7), cast(0 as bigint),
          |   (a, e) -> a + e.v_day), 7)) div 7""".stripMargin))
    def fl2(z: String): String = s"(($z) - pmod($z, 2)) div 2"
    val nl = fl2("x.v_day - element_at(acc, -7).seasonal" +
      " + element_at(acc, -1).level + element_at(acc, -1).trend")
    val step =
      s"""aggregate(
         |  slice(s, 8, greatest(size(s) - 7, 0)),
         |  transform(slice(s, 1, 7), e -> named_struct(
         |    'day', e.day, 'v_day', e.v_day,
         |    'level', l0, 'trend', cast(0 as bigint),
         |    'seasonal', e.v_day - l0, 'forecast', e.v_day)),
         |  (acc, x) -> concat(acc, array(named_struct(
         |    'day', x.day, 'v_day', x.v_day,
         |    'level', $nl,
         |    'trend', ${fl2(s"($nl) - element_at(acc, -1).level" +
                  " + element_at(acc, -1).trend")},
         |    'seasonal', ${fl2(s"x.v_day - ($nl)" +
                  " + element_at(acc, -7).seasonal")},
         |    'forecast', element_at(acc, -1).level
         |      + element_at(acc, -1).trend
         |      + element_at(acc, -7).seasonal))))""".stripMargin
    packed.select(explode(expr(step)).as("h"))
      .select(col("h.day").as("day"), col("h.v_day").as("v_day"),
        col("h.level").as("level"), col("h.trend").as("trend"),
        col("h.seasonal").as("seasonal"),
        col("h.forecast").as("forecast"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_cochran_q" -> cochranQ _,
    "ts_holt_winters_seasonal" -> holtWinters _)

  val oracle: Map[String, String] = Map(
    "ts_holt_winters_seasonal" ->
      // the recursive member layers nl -> (t2, t3) -> outputs through
      // nested subqueries so each state transition is written ONCE —
      // the SQL mirror of the engine's out-array fold (`h` referenced
      // exactly once, as the recursion requires)
      (s"""WITH RECURSIVE d0 AS (${Ext13Queries.dailySql}),
        |d AS (
        |  SELECT CAST(day AS INT) AS day, v_day,
        |    ROW_NUMBER() OVER (ORDER BY day) AS k
        |  FROM d0),
        |init AS (
        |  SELECT (s7 - (((s7 % 7) + 7) % 7)) // 7 AS l0
        |  FROM (SELECT CAST(SUM(v_day) AS BIGINT) AS s7 FROM d
        |        WHERE k <= 7)),
        |seed AS (
        |  SELECT CAST(7 AS BIGINT) AS k, CAST(i.l0 AS BIGINT) AS level,
        |    CAST(0 AS BIGINT) AS trend,
        |    (SELECT list(v_day - i.l0 ORDER BY day) FROM d
        |     WHERE k <= 7) AS sv,
        |    CAST(NULL AS INT) AS day, CAST(NULL AS BIGINT) AS v_day,
        |    CAST(NULL AS BIGINT) AS seasonal,
        |    CAST(NULL AS BIGINT) AS forecast
        |  FROM init i),
        |h AS (
        |  SELECT k, level, trend, sv, day, v_day, seasonal, forecast
        |  FROM seed
        |  UNION ALL
        |  SELECT z.k, z.nl, (z.t2 - (((z.t2 % 2) + 2) % 2)) // 2,
        |    z.sv[2:] || [(z.t3 - (((z.t3 % 2) + 2) % 2)) // 2],
        |    z.day, z.v_day,
        |    (z.t3 - (((z.t3 % 2) + 2) % 2)) // 2, z.f
        |  FROM (
        |    SELECT w.*, w.nl - w.level + w.trend AS t2,
        |      w.v_day - w.nl + w.s7v AS t3
        |    FROM (
        |      SELECT v.*, (v.t1 - (((v.t1 % 2) + 2) % 2)) // 2 AS nl
        |      FROM (
        |        SELECT h.k + 1 AS k, d.day, d.v_day, h.level,
        |          h.trend, h.sv, h.sv[1] AS s7v,
        |          d.v_day - h.sv[1] + h.level + h.trend AS t1,
        |          h.level + h.trend + h.sv[1] AS f
        |        FROM h JOIN d ON d.k = h.k + 1) v) w) z
        |)
        |SELECT d.day, d.v_day, i.l0 AS level, CAST(0 AS BIGINT)
        |    AS trend,
        |  d.v_day - i.l0 AS seasonal, d.v_day AS forecast
        |FROM d CROSS JOIN init i WHERE d.k <= 7
        |UNION ALL
        |SELECT day, v_day, level, trend, seasonal, forecast
        |FROM h WHERE k > 7
        |ORDER BY day""").stripMargin,
    "eval_cochran_q" ->
      """WITH v AS (
        |  SELECT n_chars,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents
        |), j AS (
        |  SELECT
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS j1,
        |    CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
        |      THEN 1 ELSE 0 END AS j2,
        |    CASE WHEN len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','in','to','is'], x))) >= 2
        |      THEN 1 ELSE 0 END AS j3
        |  FROM v
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(j1) AS BIGINT) AS g1,
        |    CAST(SUM(j2) AS BIGINT) AS g2,
        |    CAST(SUM(j3) AS BIGINT) AS g3,
        |    CAST(SUM(j1 + j2 + j3) AS BIGINT) AS nn,
        |    CAST(SUM((j1 + j2 + j3) * (j1 + j2 + j3)) AS BIGINT) AS b
        |  FROM j)
        |SELECT n_docs, g1, g2, g3,
        |  (3 * nn - b) // 2 AS n_splits,
        |  CAST(ROUND(2.0 * (3.0 * (CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
        |    + CAST(g2 AS DOUBLE) * CAST(g2 AS DOUBLE)
        |    + CAST(g3 AS DOUBLE) * CAST(g3 AS DOUBLE))
        |    - CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
        |    / CAST(GREATEST(3 * nn - b, 1) AS DOUBLE) * 1e6) AS BIGINT)
        |    AS q_micro,
        |  CAST(CASE WHEN CAST(ROUND(2.0 * (3.0
        |    * (CAST(g1 AS DOUBLE) * CAST(g1 AS DOUBLE)
        |    + CAST(g2 AS DOUBLE) * CAST(g2 AS DOUBLE)
        |    + CAST(g3 AS DOUBLE) * CAST(g3 AS DOUBLE))
        |    - CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))
        |    / CAST(GREATEST(3 * nn - b, 1) AS DOUBLE) * 1e6) AS BIGINT)
        |    > 5991000 THEN 1 ELSE 0 END AS INT) AS q_flag
        |FROM m""".stripMargin)
}
