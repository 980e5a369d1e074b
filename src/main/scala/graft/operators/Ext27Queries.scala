package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 batch 1: corpus curation gates and experiment analysis.
  *
  *  - `text_gopher_rules`: the Gopher/Dolma-style quality-rule
  *    battery — per-document boolean rules (word-count bounds, mean
  *    word length, stopword evidence, duplicate-word fraction)
  *    aggregated to a per-source pass-rate report with PER-RULE
  *    attribution (which gate kills how many docs). This is the
  *    filter battery an LLM data pipeline runs before tokenization;
  *    the reference has no native analog (its transform surface is
  *    delegated YQL — README.md:80-116), so this is a §7.5 north-star
  *    operator.
  *  - `ev_ab_cuped`: CUPED variance-reduced A/B effect estimation —
  *    pre-period covariate per user, pooled theta = cov(x,y)/var(x),
  *    adjusted effect + variance-reduction ratio. The standard
  *    experimentation primitive on top of `ev_ab_ttest`'s split.
  *  - `dataset_card`: the per-source dataset-card summary (docs,
  *    tokens, chars, language spread, dominant language + share) — a
  *    one-scan corpus report, the artifact every training-data
  *    release ships.
  *
  * Exactness contract: per-row metrics are exact integers (token
  * counts, char counts, milli-lattice event values); all SUMS stay
  * BIGINT (never doubles — engine-order-independent); only closed-form
  * scalars (theta, variance ratio) evaluate in doubles with IDENTICAL
  * expression text in both engines (the ev_ab_ttest precedent), then
  * round onto a micro lattice.
  *
  * 100 TB shapes: gopher rules and the card are one narrow
  * projection + one map-side-combined aggregate each (rule flags
  * collapse to conditional counts; no shuffle wider than
  * |sources| × |langs|); CUPED is two hash aggregates (user grain →
  * 6-moment global) — the user-grain shuffle is the same one every
  * per-user metric pays, and the global step is a single row.
  */
object Ext27Queries {

  // ---------------------------------------------------------------
  // text_gopher_rules
  // ---------------------------------------------------------------

  /** Word tokens = whitespace split of trimmed text (the repo-wide
    * tokenization contract, text_token_stats).
    */
  private def toks: Column =
    split(trim(col("text")), "\\s+")

  /** Per-source Gopher-rule report. Rules (each a per-doc boolean):
    *  - r_wc:   word count in [25, 80] (bounds chosen to bind on the
    *            fixture corpus; production callers tune per corpus)
    *  - r_mwl:  mean word length in [3, 10] (chars-excl-spaces / wc)
    *  - r_stop: at least 2 DISTINCT English stopwords present
    *            (the Gopher "has common words" evidence rule)
    *  - r_dup:  duplicate-word mass ≤ 60% (1 − distinct/total ≤ 0.6
    *            — the repetition gate, integer-compared as
    *            40·wc ≤ 100·distinct)
    * Output: per source — n_docs, per-rule pass counts, n_pass_all,
    * pass_rate_micro (integer lattice).
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(TextAnalysis.enStopwords.map(lit): _*)
    val d = t(spark, dir, "documents")
      .select(col("source"),
        size(toks).cast("long").as("wc"),
        // chars excluding whitespace runs: sum of token lengths
        aggregate(transform(toks, x => length(x).cast("long")),
          lit(0L), (a, x) => a + x).as("alpha_chars"),
        size(array_intersect(transform(toks, x => lower(x)), stopArr))
          .cast("long").as("n_stop_distinct"),
        size(array_distinct(toks)).cast("long").as("wc_distinct"))
      .select(col("source"),
        (col("wc") >= 25 && col("wc") <= 80).as("r_wc"),
        // 3 <= alpha_chars/wc <= 10, integer-compared
        (col("alpha_chars") >= col("wc") * 3 &&
          col("alpha_chars") <= col("wc") * 10).as("r_mwl"),
        (col("n_stop_distinct") >= 2).as("r_stop"),
        // 1 - distinct/wc <= 0.6  <=>  40*wc <= 100*distinct
        (col("wc") * 40 <= col("wc_distinct") * 100).as("r_dup"))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        cnt(col("r_wc")).as("pass_wc"),
        cnt(col("r_mwl")).as("pass_mwl"),
        cnt(col("r_stop")).as("pass_stop"),
        cnt(col("r_dup")).as("pass_dup"),
        cnt(col("r_wc") && col("r_mwl") && col("r_stop") && col("r_dup"))
          .as("n_pass_all"))
      .withColumn("pass_rate_micro",
        expr("n_pass_all * 1000000 div n_docs"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------
  // ev_ab_cuped
  // ---------------------------------------------------------------

  /** CUPED over the `user_id % 2` split (the ev_ab_ttest experiment):
    * covariate x = pre-period per-user value sum (milli), outcome
    * y = post-period sum; theta fit POOLED across arms (standard
    * practice — arm assignment is independent of x);
    * y'_u = y_u − θ·(x_u − mean_x). Reports raw vs adjusted arm
    * effect and the realized variance-reduction ratio (≈ corr²).
    * Users with no pre-period activity contribute x = 0 (the
    * production convention for new users).
    */
  def abCuped(spark: SparkSession, dir: String): DataFrame = {
    val cutSec = 1705363200L // 2024-01-16T00:00:00Z
    val perUser = t(spark, dir, "events")
      .select(col("user_id"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("user_id")
      .agg(sum(when(col("tsec") < cutSec, col("vm")).otherwise(0L))
          .as("x"),
        sum(when(col("tsec") >= cutSec, col("vm")).otherwise(0L))
          .as("y"))
      .withColumn("grp", col("user_id") % 2)
    def side(g: Int, c: Column): Column =
      sum(when(col("grp") === g, c).otherwise(0L))
    val m = perUser.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"),
      side(0, lit(1L)).as("n_a"), side(0, col("y")).as("sy_a"),
      side(0, col("x")).as("sx_a"),
      side(1, lit(1L)).as("n_b"), side(1, col("y")).as("sy_b"),
      side(1, col("x")).as("sx_b"))
    // identical expression text in the oracle — doubles by design
    m.withColumn("covxy", expr(
        "(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))"))
      .withColumn("varx", expr(
        "(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double))"))
      .withColumn("vary", expr(
        "(cast(n as double) * cast(syy as double)" +
          " - cast(sy as double) * cast(sy as double))"))
      .withColumn("theta", expr("covxy / varx"))
      .select(col("n").as("n_users"), col("n_a"), col("n_b"),
        expr("cast(round(theta * 1000000) as bigint)")
          .as("theta_micro"),
        expr("cast(round((cast(sy_b as double) / cast(n_b as double)" +
          " - cast(sy_a as double) / cast(n_a as double))) as bigint)")
          .as("effect_raw_milli"),
        // adjusted effect: mean_B(y-θx) − mean_A(y-θx); the mean_x
        // recentering cancels in the difference
        expr("cast(round(((cast(sy_b as double)" +
          " - theta * cast(sx_b as double)) / cast(n_b as double)" +
          " - (cast(sy_a as double)" +
          " - theta * cast(sx_a as double)) / cast(n_a as double)))" +
          " as bigint)").as("effect_cuped_milli"),
        // realized variance reduction = corr(x,y)^2
        expr("cast(round(covxy * covxy / (varx * vary) * 1000000)" +
          " as bigint)").as("var_reduction_micro"))
  }

  // ---------------------------------------------------------------
  // dataset_card
  // ---------------------------------------------------------------

  /** Per-source dataset card: docs, whitespace tokens, chars,
    * language spread, dominant language + micro share, token length
    * extremes + mean (milli). One scan → (source, lang) cells →
    * per-source rollup; the dominant language is the (count desc,
    * lang asc) leader — deterministic tie-break.
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "documents")
      .select(col("source"), col("lang"),
        size(toks).cast("long").as("wc"),
        length(col("text")).cast("long").as("ch"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("wc").as("n_tokens"),
        sum("ch").as("n_chars"),
        min("wc").as("min_wc"), max("wc").as("max_wc"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("n_docs").desc, col("lang"))
    cells
      .withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum("n_chars").as("n_chars"),
        count(lit(1)).as("n_langs"),
        min("min_wc").as("min_tokens"),
        max("max_wc").as("max_tokens"),
        max(when(col("rk") === 1, col("lang"))).as("top_lang"),
        max(when(col("rk") === 1, col("n_docs"))).as("top_lang_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("n_langs"), col("min_tokens"),
        col("max_tokens"),
        expr("n_tokens * 1000 div n_docs").as("mean_tokens_milli"),
        col("top_lang"),
        expr("top_lang_docs * 1000000 div n_docs")
          .as("top_lang_share_micro"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_gopher_rules" -> gopherRules _,
    "ev_ab_cuped" -> abCuped _,
    "dataset_card" -> datasetCard _,
  )

  private val enList = TextAnalysis.enStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  val oracle: Map[String, String] = Map(
    "text_gopher_rules" -> (
      s"""WITH d AS (
         |  SELECT source,
         |    string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents
         |), f AS (
         |  SELECT source,
         |    CAST(len(tk) AS BIGINT) AS wc,
         |    CAST(list_sum(list_transform(tk, x -> length(x))) AS BIGINT)
         |      AS alpha_chars,
         |    CAST(len(list_distinct(list_filter(list_transform(tk,
         |      x -> lower(x)), x -> list_contains($enList, x))))
         |      AS BIGINT) AS n_stop_distinct,
         |    CAST(len(list_distinct(tk)) AS BIGINT) AS wc_distinct
         |  FROM d
         |), r AS (
         |  SELECT source,
         |    (wc >= 25 AND wc <= 80) AS r_wc,
         |    (alpha_chars >= wc * 3 AND alpha_chars <= wc * 10) AS r_mwl,
         |    (n_stop_distinct >= 2) AS r_stop,
         |    (wc * 40 <= wc_distinct * 100) AS r_dup
         |  FROM f)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS BIGINT) AS pass_wc,
         |  CAST(sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS pass_mwl,
         |  CAST(sum(CASE WHEN r_stop THEN 1 ELSE 0 END) AS BIGINT) AS pass_stop,
         |  CAST(sum(CASE WHEN r_dup THEN 1 ELSE 0 END) AS BIGINT) AS pass_dup,
         |  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_stop AND r_dup
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_all,
         |  CAST(sum(CASE WHEN r_wc AND r_mwl AND r_stop AND r_dup
         |    THEN 1 ELSE 0 END) * 1000000
         |    // count(*) AS BIGINT) AS pass_rate_micro
         |FROM r GROUP BY source ORDER BY source""".stripMargin),
    "ev_ab_cuped" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < 1705363200
        |      THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS x,
        |    sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= 1705363200
        |      THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS y,
        |    user_id % 2 AS grp
        |  FROM events GROUP BY user_id
        |), m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN grp = 0 THEN y ELSE 0 END) AS BIGINT) AS sy_a,
        |    CAST(sum(CASE WHEN grp = 0 THEN x ELSE 0 END) AS BIGINT) AS sx_a,
        |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN grp = 1 THEN y ELSE 0 END) AS BIGINT) AS sy_b,
        |    CAST(sum(CASE WHEN grp = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_b
        |  FROM pu
        |), c AS (
        |  SELECT *,
        |    (cast(n as double) * cast(sxy as double)
        |      - cast(sx as double) * cast(sy as double)) AS covxy,
        |    (cast(n as double) * cast(sxx as double)
        |      - cast(sx as double) * cast(sx as double)) AS varx,
        |    (cast(n as double) * cast(syy as double)
        |      - cast(sy as double) * cast(sy as double)) AS vary
        |  FROM m
        |), tc AS (SELECT *, covxy / varx AS theta FROM c)
        |SELECT n AS n_users, n_a, n_b,
        |  cast(round(theta * 1000000) as bigint) AS theta_micro,
        |  cast(round((cast(sy_b as double) / cast(n_b as double)
        |    - cast(sy_a as double) / cast(n_a as double))) as bigint)
        |    AS effect_raw_milli,
        |  cast(round(((cast(sy_b as double)
        |    - theta * cast(sx_b as double)) / cast(n_b as double)
        |    - (cast(sy_a as double)
        |    - theta * cast(sx_a as double)) / cast(n_a as double)))
        |    as bigint) AS effect_cuped_milli,
        |  cast(round(covxy * covxy / (varx * vary) * 1000000) as bigint)
        |    AS var_reduction_micro
        |FROM tc""".stripMargin,
    "dataset_card" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT) AS n_tokens,
        |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |    CAST(min(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT) AS min_wc,
        |    CAST(max(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT) AS max_wc
        |  FROM documents GROUP BY source, lang
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY n_docs DESC, lang) AS rk
        |  FROM cells)
        |SELECT source, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(count(*) AS BIGINT) AS n_langs,
        |  CAST(min(min_wc) AS BIGINT) AS min_tokens,
        |  CAST(max(max_wc) AS BIGINT) AS max_tokens,
        |  CAST(sum(n_tokens) * 1000 // sum(n_docs) AS BIGINT)
        |    AS mean_tokens_milli,
        |  max(CASE WHEN rk = 1 THEN lang END) AS top_lang,
        |  CAST(max(CASE WHEN rk = 1 THEN n_docs END) * 1000000
        |    // sum(n_docs) AS BIGINT) AS top_lang_share_micro
        |FROM rk GROUP BY source ORDER BY source""".stripMargin,
  )
}
