package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch A: model-evaluation and data-mixing diagnostics the
  * eval_/text_ families lacked — regression metrics (the eval side of
  * a value-prediction filter, complementing the classification trio
  * eval_auc / eval_calibration / eval_langid_prf) and per-source
  * unigram KL divergence (the distribution-shift number a corpus
  * mixer reads before weighting sources; reference analog: the
  * monitoring surface generalized from pipeline health to data
  * health, App.java:41-44).
  */
object Ext74Queries {

  // ---------------------------------------------------------------
  // eval_regression_metrics
  // ---------------------------------------------------------------

  /** MAE / RMSE / R² of the per-event_type mean predictor: fit on
    * even event_ids, evaluated on odd — the standard
    * train/holdout-split regression report. Everything that can
    * overflow stays exact-BIGINT on the value_milli lattice (sums of
    * |err| and err²); only the final RMSE/R² ratios touch doubles,
    * with identical expression text in the DuckDB oracle (the
    * ev_ab_ttest discipline). R² uses the n-scaled variance identity
    * n·Σy² − (Σy)² so no fractional mean is ever materialized;
    * zero-variance groups surface NULL (guarded identically in both
    * engines).
    *
    * 100 TB shape: one hash aggregate over the fit half (|types|
    * rows, broadcast back), one hash aggregate over the holdout half.
    * Nothing is windowed; nothing is collected.
    */
  def regressionMetrics(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val fit = ev.filter(col("event_id") % 2 === 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_fit"), sum("vm").as("s_fit"))
      // vm >= 0 by construction, so truncating div == floor
      .withColumn("pred", expr("s_fit div n_fit"))
      .select("event_type", "n_fit", "pred")
    ev.filter(col("event_id") % 2 === 1)
      .join(broadcast(fit), "event_type")
      .groupBy("event_type")
      .agg(max("n_fit").as("n_fit"), max("pred").as("pred"),
        count(lit(1)).as("n_test"),
        sum(abs(col("vm") - col("pred"))).as("sae"),
        sum((col("vm") - col("pred")) * (col("vm") - col("pred")))
          .as("sse"),
        sum("vm").as("sy"),
        sum(col("vm") * col("vm")).as("syy"))
      .withColumn("mae_micro", expr("sae * 1000000 div n_test"))
      .withColumn("rmse_r6", expr(
        "round(sqrt(cast(sse as double) / cast(n_test as double)), 6)"))
      .withColumn("r2_r6", expr(
        """CASE WHEN n_test * syy - sy * sy = 0 THEN NULL
          |ELSE round(1.0d - cast(n_test as double)
          |  * cast(sse as double)
          |  / (cast(n_test as double) * cast(syy as double)
          |     - cast(sy as double) * cast(sy as double)), 6)
          |END""".stripMargin))
      .select("event_type", "n_fit", "pred", "n_test", "sae", "sse",
        "mae_micro", "rmse_r6", "r2_r6")
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // text_source_kl
  // ---------------------------------------------------------------

  /** Per-source unigram KL divergence from the corpus distribution,
    * in micro-nats: KL(p_src ‖ p_corpus) = Σ_tok (c_st/N_s) ·
    * ln((c_st·N)/(N_s·c_t)). Each token's contribution is quantized
    * to the micro lattice BEFORE the sum, so the aggregate is an
    * order-free BIGINT sum (parallel double summation would be
    * order-dependent across engines); ln sees only exact integer
    * ratios. KL ≥ 0 up to the per-term quantization (±|types|
    * micro-nats) — the spec asserts the bound.
    *
    * 100 TB shape: one (source, token) count shuffle, one vocab-keyed
    * join to the corpus counts, a 20-row per-source totals broadcast
    * and a 1-row corpus-total broadcast. The corpus is never
    * windowed.
    */
  def sourceKl(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("source"), lower(col("tok")).as("tok"))
    val st = toks.groupBy("source", "tok")
      .agg(count(lit(1)).as("c_st"))
      .cache() // read three times: terms, per-source and corpus totals
    val srcTot = st.groupBy("source").agg(sum("c_st").as("n_s"),
      count(lit(1)).as("n_types"))
    val corpusTok = st.groupBy("tok").agg(sum("c_st").as("c_t"))
    val corpusTot = st.agg(sum("c_st").as("n_corpus"))
    st.join(corpusTok, "tok")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpusTot))
      .withColumn("term_micro", expr(
        """cast(round(cast(c_st as double) / cast(n_s as double)
          |  * ln(cast(c_st as double) * cast(n_corpus as double)
          |      / (cast(n_s as double) * cast(c_t as double)))
          |  * 1000000) as bigint)""".stripMargin))
      .groupBy("source")
      .agg(max("n_s").as("n_toks"), max("n_types").as("n_types"),
        sum("term_micro").as("kl_micro"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------
  // dq_distribution_psi
  // ---------------------------------------------------------------

  /** Population Stability Index per event_type between the first and
    * second half of the day range — THE industry drift score a model
    * monitor alarms on (complements dq_ks_test, which is the
    * unbinned global two-sample statistic): PSI = Σ_bins (p−q)·
    * ln(p/q) over 10 fixed value bins (20k-milli wide, top bin
    * open), Laplace-(+1)-smoothed so empty bins stay finite. Terms
    * quantize to micro-nats per bin before the order-free BIGINT
    * sum. Convention: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * broken — the report emits the score, not the verdict.
    *
    * 100 TB shape: one (type, bin, half) count aggregate collapses
    * the corpus to ≤ |types|·10·2 cells; the dense bin spine is a
    * bounded-domain cross join (the dq_t_closeness shape).
    */
  def distributionPsi(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("event_type"),
        expr("least(cast(round(value * 1000) as bigint) div 20000, 9)")
          .as("bin"))
    val mid = broadcast(ev.agg(
      expr("(min(day) + max(day)) div 2").as("mid")))
    val cells = ev.crossJoin(mid)
      .groupBy("event_type", "bin")
      .agg(sum(when(col("day") <= col("mid"), 1L).otherwise(0L))
        .as("c1"),
        sum(when(col("day") > col("mid"), 1L).otherwise(0L)).as("c2"))
    // dense |types| x 10 spine: empty bins must contribute their
    // smoothed term
    val spine = ev.select("event_type").distinct()
      .crossJoin(broadcast(
        spark.range(10).select(col("id").as("bin"))))
    val tot = cells.groupBy("event_type")
      .agg(sum("c1").as("n1"), sum("c2").as("n2"))
    spine.join(cells, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("c1", "c2"))
      .join(broadcast(tot), "event_type")
      .withColumn("term_micro", expr(
        """cast(round((cast(c1 + 1 as double) / cast(n1 + 10 as double)
          |  - cast(c2 + 1 as double) / cast(n2 + 10 as double))
          |  * ln(cast(c1 + 1 as double) * cast(n2 + 10 as double)
          |      / (cast(n1 + 10 as double) * cast(c2 + 1 as double)))
          |  * 1000000) as bigint)""".stripMargin))
      .groupBy("event_type")
      .agg(max("n1").as("n1"), max("n2").as("n2"),
        sum("term_micro").as("psi_micro"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // tok_byte_fallback
  // ---------------------------------------------------------------

  /** Encoding cost under a FIXED 256-type vocabulary with byte
    * fallback (the tokenizer-budget question tok_oov_curve's
    * type-level rates don't answer): an in-vocab token emits 1 id, an
    * OOV token falls back to one id per character. Per language:
    * whitespace tokens, OOV tokens, emitted ids, and the expansion
    * ratio — what a fixed-vocab tokenizer actually costs on each
    * slice of the corpus.
    *
    * 100 TB shape: vocabulary = sort-limit top-256
    * (TakeOrderedAndProject) broadcast; one narrow token explode
    * joined against it; one |langs| aggregate.
    */
  def byteFallback(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok0"))
      .select(col("lang"), lower(col("tok0")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).limit(256)
      .select(col("tok"), lit(1L).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("cost", when(col("in_vocab").isNotNull, 1L)
        .otherwise(length(col("tok")).cast("long")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .as("n_oov"),
        sum("cost").as("n_emitted"))
      .withColumn("oov_share_micro",
        expr("n_oov * 1000000 div n_tokens"))
      .withColumn("expansion_micro",
        expr("n_emitted * 1000000 div n_tokens"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_regression_metrics" -> regressionMetrics _,
    "text_source_kl" -> sourceKl _,
    "dq_distribution_psi" -> distributionPsi _,
    "tok_byte_fallback" -> byteFallback _,
  )

  val oracle: Map[String, String] = Map(
    "eval_regression_metrics" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), fit AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_fit,
        |    CAST(SUM(vm) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS pred
        |  FROM ev WHERE event_id % 2 = 0 GROUP BY event_type
        |), te AS (
        |  SELECT e.event_type, f.n_fit, f.pred,
        |    CAST(COUNT(*) AS BIGINT) AS n_test,
        |    CAST(SUM(abs(e.vm - f.pred)) AS BIGINT) AS sae,
        |    CAST(SUM((e.vm - f.pred) * (e.vm - f.pred)) AS BIGINT)
        |      AS sse,
        |    CAST(SUM(e.vm) AS BIGINT) AS sy,
        |    CAST(SUM(e.vm * e.vm) AS BIGINT) AS syy
        |  FROM ev e JOIN fit f ON f.event_type = e.event_type
        |  WHERE e.event_id % 2 = 1
        |  GROUP BY e.event_type, f.n_fit, f.pred)
        |SELECT event_type, n_fit, pred, n_test, sae, sse,
        |  CAST((sae * 1000000) // n_test AS BIGINT) AS mae_micro,
        |  round(sqrt(CAST(sse AS DOUBLE) / CAST(n_test AS DOUBLE)), 6)
        |    AS rmse_r6,
        |  CASE WHEN n_test * syy - sy * sy = 0 THEN NULL
        |  ELSE round(1.0 - CAST(n_test AS DOUBLE)
        |    * CAST(sse AS DOUBLE)
        |    / (CAST(n_test AS DOUBLE) * CAST(syy AS DOUBLE)
        |       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
        |  END AS r2_r6
        |FROM te ORDER BY event_type""".stripMargin,
    "text_source_kl" ->
      """WITH tk AS (
        |  SELECT source,
        |    lower(unnest(string_split_regex(trim(text), '\s+')))
        |      AS tok
        |  FROM documents
        |), st AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
        |  FROM tk GROUP BY source, tok
        |), src_tot AS (
        |  SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM st GROUP BY source
        |), corpus_tok AS (
        |  SELECT tok, CAST(SUM(c_st) AS BIGINT) AS c_t
        |  FROM st GROUP BY tok
        |), corpus_tot AS (
        |  SELECT CAST(SUM(c_st) AS BIGINT) AS n_corpus FROM st
        |), terms AS (
        |  SELECT s.source, t.n_s, t.n_types,
        |    CAST(round(CAST(s.c_st AS DOUBLE) / CAST(t.n_s AS DOUBLE)
        |      * ln(CAST(s.c_st AS DOUBLE) * CAST(g.n_corpus AS DOUBLE)
        |          / (CAST(t.n_s AS DOUBLE) * CAST(c.c_t AS DOUBLE)))
        |      * 1000000) AS BIGINT) AS term_micro
        |  FROM st s
        |  JOIN corpus_tok c ON c.tok = s.tok
        |  JOIN src_tot t ON t.source = s.source, corpus_tot g)
        |SELECT source, MAX(n_s) AS n_toks, MAX(n_types) AS n_types,
        |  CAST(SUM(term_micro) AS BIGINT) AS kl_micro
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    "dq_distribution_psi" ->
      """WITH ev AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
        |    least(CAST(round(value * 1000) AS BIGINT) // 20000, 9)
        |      AS bin
        |  FROM events
        |), cut AS (
        |  SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM ev
        |), cells AS (
        |  SELECT event_type, bin,
        |    CAST(SUM(CASE WHEN day <= c.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c1,
        |    CAST(SUM(CASE WHEN day > c.mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c2
        |  FROM ev, cut c GROUP BY event_type, bin
        |), spine AS (
        |  SELECT t.event_type, b.bin
        |  FROM (SELECT DISTINCT event_type FROM ev) t,
        |    (SELECT CAST(range AS BIGINT) AS bin FROM range(10)) b
        |), tot AS (
        |  SELECT event_type, CAST(SUM(c1) AS BIGINT) AS n1,
        |    CAST(SUM(c2) AS BIGINT) AS n2
        |  FROM cells GROUP BY event_type
        |), terms AS (
        |  SELECT s.event_type, t.n1, t.n2,
        |    CAST(round((CAST(COALESCE(c.c1, 0) + 1 AS DOUBLE)
        |        / CAST(t.n1 + 10 AS DOUBLE)
        |      - CAST(COALESCE(c.c2, 0) + 1 AS DOUBLE)
        |        / CAST(t.n2 + 10 AS DOUBLE))
        |      * ln(CAST(COALESCE(c.c1, 0) + 1 AS DOUBLE)
        |          * CAST(t.n2 + 10 AS DOUBLE)
        |          / (CAST(t.n1 + 10 AS DOUBLE)
        |             * CAST(COALESCE(c.c2, 0) + 1 AS DOUBLE)))
        |      * 1000000) AS BIGINT) AS term_micro
        |  FROM spine s
        |  LEFT JOIN cells c
        |    ON c.event_type = s.event_type AND c.bin = s.bin
        |  JOIN tot t ON t.event_type = s.event_type)
        |SELECT event_type, MAX(n1) AS n1, MAX(n2) AS n2,
        |  CAST(SUM(term_micro) AS BIGINT) AS psi_micro
        |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin,
    "tok_byte_fallback" ->
      """WITH tk AS (
        |  SELECT lang,
        |    lower(unnest(string_split_regex(trim(text), '\s+')))
        |      AS tok
        |  FROM documents
        |), vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |    FROM tk GROUP BY tok
        |    ORDER BY n DESC, tok LIMIT 256)
        |), costed AS (
        |  SELECT t.lang,
        |    CASE WHEN v.tok IS NOT NULL THEN 1
        |      ELSE length(t.tok) END AS cost,
        |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tk t LEFT JOIN vocab v ON v.tok = t.tok)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(oov) AS BIGINT) AS n_oov,
        |  CAST(SUM(cost) AS BIGINT) AS n_emitted,
        |  CAST((SUM(oov) * 1000000) // COUNT(*) AS BIGINT)
        |    AS oov_share_micro,
        |  CAST((SUM(cost) * 1000000) // COUNT(*) AS BIGINT)
        |    AS expansion_micro
        |FROM costed GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
