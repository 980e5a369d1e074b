package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 batch C:
  *
  *  - `eval_exposure_fairness`: exposure share per label group across
  *    the retrieval top-10 (DCG-discounted), next to each group's
  *    corpus share — the retrieval-fairness audit that says whether
  *    ranking amplifies or suppresses a group beyond its base rate.
  *    The standard "exposure vs relevance" disparity readout of the
  *    fair-ranking literature, on the engine's own exact top-k.
  *  - `ts_ljung_box`: the Ljung–Box portmanteau statistic over the
  *    gap-FILLED hourly count series (missing hours are genuine
  *    zeros, where `ts_acf` drops gapped pairs) — cumulative Q per
  *    lag 1..10, the standard "is there ANY autocorrelation left"
  *    diagnostic a forecasting residual check runs.
  *  - `eval_fleiss_kappa`: multi-rater agreement across three
  *    deterministic quality judges — the statistic an LLM-judge
  *    ensemble is audited with (Cohen's kappa handles only two),
  *    exact-integer end to end.
  *  - `ts_pacf`: partial autocorrelation via Durbin–Levinson on the
  *    same gap-filled rho estimator as `ts_ljung_box` — completes
  *    the Box–Jenkins identification kit (acf / portmanteau / pacf).
  *  - `ts_perm_entropy`: order-3 permutation entropy of the hourly
  *    series — the model-free complexity measure (ordinal-pattern
  *    histogram entropy) the forecasting family lacks.
  *  - `embed_anisotropy`: mean consecutive-pair cosine + mean-vector
  *    energy share — the standard embedding-space anisotropy audit
  *    (whether to mean-center/whiten before cosine retrieval).
  */
object Ext84Queries {

  /** Exposure per label over the exact cosine top-10 of the 8 probe
    * queries (the `sim_cosine_topk` machinery, k=10): each hit
    * contributes the DCG discount 1/log2(rank+1), quantized ONCE per
    * rank to the micro lattice — a 10-entry data-independent table,
    * so engine parity is structural (ts_spectral_peak's argument).
    * Per label: corpus share vs exposure share in micro, and their
    * difference (skew) — positive skew = the ranking over-exposes
    * the group relative to its corpus base rate.
    *
    * 100 TB shape: the top-k side is the broadcast-probe brute pass
    * the sim family already pays (sampled probe set at scale; LSH/IVF
    * variants swap in); the fairness reduction is two bounded
    * aggregates (≤ |labels| rows) plus 1-row total broadcasts.
    */
  def exposureFairness(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
    val hits = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 10)
      .join(emb.select(col("vec_id").as("n_id"), col("label")), "n_id")
      .withColumn("disc_micro",
        round(lit(1e6) * log(lit(2.0))
          / log(col("rank").cast("double") + 1)).cast("long"))
    val exp = hits.groupBy("label")
      .agg(count(lit(1)).as("n_hits"),
        sum("disc_micro").as("exp_sum"))
    val expTot = exp.agg(sum("exp_sum").as("exp_tot"))
    val corpus = emb.groupBy("label")
      .agg(count(lit(1)).as("n_corpus"))
    val corpusTot = corpus.agg(sum("n_corpus").as("n_tot"))
    corpus
      .join(exp, Seq("label"), "left")
      .na.fill(0L, Seq("n_hits", "exp_sum"))
      .crossJoin(broadcast(corpusTot))
      .crossJoin(broadcast(expTot))
      .withColumn("corpus_share_micro",
        expr("n_corpus * 1000000 div n_tot"))
      .withColumn("exp_share_micro",
        expr("exp_sum * 1000000 div exp_tot"))
      .withColumn("skew_micro",
        expr("exp_share_micro - corpus_share_micro"))
      .select("label", "n_corpus", "corpus_share_micro", "n_hits",
        "exp_share_micro", "skew_micro")
      .orderBy("label")
  }

  // ---------------------------------------------------------------
  // ts_ljung_box
  // ---------------------------------------------------------------

  /** Ljung–Box Q over the hourly event-count series, lags 1..10.
    * The series is the CONTIGUOUS hour spine min..max with missing
    * hours filled as 0 (a count series' gaps are data, not missing
    * data — the deliberate contrast with `ts_acf`'s pair-dropping).
    * The textbook estimator ρ̂ₖ = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)² is
    * computed n²-rescaled so numerator and denominator are exact
    * BIGINTs (the ts_burst_days discipline); ρ̂ₖ takes the single
    * rounded division onto the micro lattice, and Q accumulates in
    * pure integer arithmetic: Q_micro = n(n+2)·Σₖ (ρ̂ₖ²div(n−k))
    * div 1e6.
    *
    * 100 TB shape: the corpus collapses to the |hours|-bounded spine
    * first; the 10 per-lag self-joins and the cumulative window all
    * run on that bounded table; global moments broadcast as 1 row.
    */
  /** The gap-filled hourly count series (contiguous hour spine
    * min..max, missing hours = 0) — the shared input of the ts_*
    * diagnostics below.
    */
  private[graft] def hourlySeries(spark: SparkSession,
      dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .select(expr("ts div 3600000000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
    val spine = counts.agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("hr"))
    spine.join(counts, Seq("hr"), "left").na.fill(0L, Seq("cnt"))
  }

  /** Shared by ts_ljung_box and ts_pacf: per-lag autocorrelation of
    * the gap-filled hourly count series on the micro lattice, with
    * the n²-rescaled exact-BIGINT moment construction. Returns one
    * row per lag 1..maxLag: (lag, n_pairs, rho_micro, n).
    */
  private def rhoTable(spark: SparkSession, dir: String,
      maxLag: Int): DataFrame = {
    val series = hourlySeries(spark, dir)
    val g = series.agg(count(lit(1)).as("n"), sum("cnt").as("s"),
      sum(expr("cnt * cnt")).as("sxx"))
    val lagged = (1 to maxLag).map { lg =>
      series.select(col("hr"), col("cnt").as("x"))
        .join(series.select((col("hr") - lg).as("hr"),
          col("cnt").as("y")), "hr")
        .groupBy()
        .agg(count(lit(1)).as("n_pairs"),
          sum("x").as("sxh"), sum("y").as("sxt"),
          sum(expr("x * y")).as("sxy"))
        .select(lit(lg.toLong).as("lag"), col("n_pairs"), col("sxh"),
          col("sxt"), col("sxy"))
    }.reduce(_ unionAll _)
    lagged.crossJoin(broadcast(g))
      // greatest(denom, 1): n²·sxx − n·s² ≥ 0 by Cauchy–Schwarz and
      // is 0 only for a CONSTANT series (where the numerator is also
      // exactly 0, so rho lands at 0) — without the guard Spark casts
      // the Inf/NaN to NULL while DuckDB errors on CAST(inf AS BIGINT),
      // a parity/crash divergence on degenerate data
      .withColumn("rho_micro", expr(
        "cast(round(cast(n * n * sxy - n * s * (sxh + sxt)" +
          " + n_pairs * s * s as double)" +
          " / cast(greatest(n * n * sxx - n * s * s, 1) as double)" +
          " * 1e6) as bigint)"))
      .select("lag", "n_pairs", "rho_micro", "n")
  }

  def ljungBox(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy("lag")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    // 10-row lattice — bounded-domain global window
    rhoTable(spark, dir, 10)
      .withColumn("term",
        expr("(rho_micro * rho_micro) div (n - lag)"))
      .withColumn("cum", sum("term").over(w))
      .withColumn("q_micro", expr(
        "(n * (n + 2) * cum) div 1000000"))
      .select("lag", "n_pairs", "rho_micro", "q_micro")
      .orderBy("lag")
  }

  // ---------------------------------------------------------------
  // ts_pacf
  // ---------------------------------------------------------------

  /** Partial autocorrelation at lags 1..3 via Durbin–Levinson,
    * completing the Box–Jenkins identification kit (`ts_acf` /
    * `ts_ljung_box` / this): φ₁₁ = ρ₁; φ₂₂ = (ρ₂−ρ₁²)/(1−ρ₁²);
    * φ₃₃ = (ρ₃·1e6 − φ₂₁ρ₂ − φ₂₂ρ₁)/(1e12 − φ₂₁ρ₁ − φ₂₂ρ₂) with
    * φ₂₁ = ρ₁(1−φ₂₂). Built on the SAME gap-filled rho estimator as
    * ts_ljung_box ([[rhoTable]]); each φ is quantized ONCE to the
    * micro lattice and the next level consumes the QUANTIZED value,
    * so every division sees exact-integer inputs and engine parity
    * is term-by-term. PACF cutting off after lag p is the standard
    * AR(p) signature the trend/AR fits in the catalog assume.
    *
    * 100 TB shape: identical to ts_ljung_box — the corpus collapses
    * to the hourly spine; everything after is arithmetic on ≤ 3 rows.
    */
  def pacf(spark: SparkSession, dir: String): DataFrame = {
    val rhos = rhoTable(spark, dir, 3)
      .groupBy()
      .agg(max(when(col("lag") === 1, col("rho_micro"))).as("r1"),
        max(when(col("lag") === 2, col("rho_micro"))).as("r2"),
        max(when(col("lag") === 3, col("rho_micro"))).as("r3"))
      // Durbin–Levinson denominators are prediction-error-variance
      // ratios, ≥ 0 for a genuine autocorrelation sequence and 0 only
      // when the process is deterministic (|ρ₁| = 1 for f22; the f33
      // analog) — greatest(…, 1) pins that degenerate case to a finite
      // lattice point identically on both engines instead of
      // NULL-vs-CAST-error divergence
      .withColumn("f22", expr(
        "cast(round(cast(r2 * 1000000 - r1 * r1 as double)" +
          " / cast(greatest(1000000000000 - r1 * r1, 1) as double)" +
          " * 1e6) as bigint)"))
      .withColumn("f21", expr(
        "cast(round(cast(r1 * (1000000 - f22) as double) / 1e6)" +
          " as bigint)"))
      .withColumn("f33", expr(
        "cast(round(cast(r3 * 1000000 - f21 * r2 - f22 * r1" +
          " as double)" +
          " / cast(greatest(1000000000000 - f21 * r1 - f22 * r2, 1)" +
          " as double) * 1e6) as bigint)"))
    rhos.selectExpr(
      "stack(3, 1L, r1, r1, 2L, r2, f22, 3L, r3, f33)" +
        " as (lag, rho_micro, pacf_micro)")
      .orderBy("lag")
  }

  // ---------------------------------------------------------------
  // ts_perm_entropy
  // ---------------------------------------------------------------

  /** Permutation entropy (order-3 ordinal patterns) of the hourly
    * count series — the standard model-free complexity measure: map
    * every consecutive triple to the permutation of its value ranks
    * (ties broken by position, the textbook rule), histogram the 6
    * patterns, and report the Shannon entropy of that distribution
    * in micro-nats (quantize-each-ln-once). Low entropy = rigid
    * periodic structure; max (ln 6 ≈ 1.79) = white noise — the
    * series-complexity probe the forecasting family lacks.
    *
    * 100 TB shape: the corpus collapses to the hourly spine; the
    * triple construction is two hr-keyed self-joins of that bounded
    * table; the histogram is ≤ 6 rows.
    */
  def permEntropy(spark: SparkSession, dir: String): DataFrame = {
    val s = hourlySeries(spark, dir)
    val tri = s.select(col("hr"), col("cnt").as("x0"))
      .join(s.select((col("hr") - 1).as("hr"), col("cnt").as("x1")),
        "hr")
      .join(s.select((col("hr") - 2).as("hr"), col("cnt").as("x2")),
        "hr")
    // rank of x_i within the triple; earlier position wins ties
    val pat = tri
      .withColumn("r0", expr(
        "(case when x1 < x0 then 1 else 0 end)" +
          " + (case when x2 < x0 then 1 else 0 end)"))
      .withColumn("r1", expr(
        "(case when x0 <= x1 then 1 else 0 end)" +
          " + (case when x2 < x1 then 1 else 0 end)"))
      .withColumn("r2", expr(
        "(case when x0 <= x2 then 1 else 0 end)" +
          " + (case when x1 <= x2 then 1 else 0 end)"))
      .withColumn("pattern",
        expr("cast(r0 * 9 + r1 * 3 + r2 as bigint)"))
    val g = pat.groupBy("pattern").agg(count(lit(1)).as("n"))
      .withColumn("lnn_micro",
        round(log(col("n").cast("double")) * 1e6).cast("long"))
    // ≤ 6 rows — bounded-domain global windows
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    g.withColumn("n_tri", sum("n").over(wAll))
      .withColumn("sum_nlnn", sum(expr("n * lnn_micro")).over(wAll))
      .withColumn("share_micro", expr("(n * 1000000) div n_tri"))
      .withColumn("h_micro",
        round(log(col("n_tri").cast("double")) * 1e6).cast("long")
          - expr("sum_nlnn div n_tri"))
      .select("pattern", "n", "share_micro", "h_micro")
      .orderBy("pattern")
  }

  // ---------------------------------------------------------------
  // embed_anisotropy
  // ---------------------------------------------------------------

  /** Embedding-space anisotropy audit — the two standard measures:
    * (a) mean pairwise cosine over the deterministic consecutive-id
    * pairing (isotropic space → ≈ 0; the "narrow cone" pathology →
    * large positive), each pair's cosine quantized ONCE to the micro
    * lattice so the mean is an order-free integer sum with the
    * pmod-floor division (cosines are signed); (b) the mean-vector
    * energy share ‖μ‖²/E[‖x‖²] = Σ_d S1_d² / (n·Σ_d S2_d) from exact
    * milli-lattice moments (one IEEE division). High values on either
    * say "subtract the mean / whiten before cosine retrieval" — the
    * audit behind embed_corr_pairs' remediation.
    *
    * 100 TB shape: one corpus explode to the milli lattice feeds a
    * 64-row marginal aggregate and one vec_id+1 equi self-join; both
    * collapse to a 1-row report.
    */
  def anisotropy(spark: SparkSession, dir: String): DataFrame = {
    val el = t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding"))
        .as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        expr("cast(round(x * 1000) as bigint)").as("xm"))
    val marg = el.groupBy("dim")
      .agg(sum("xm").as("s1"), sum(expr("xm * xm")).as("s2"))
      .agg(sum(expr("s1 * s1")).as("sum_s1sq"),
        sum("s2").as("sum_s2"))
    val nv = el.select("vec_id").distinct().agg(count(lit(1)).as("n"))
    val a = el.select(col("vec_id"), col("dim"), col("xm").as("xa"))
    val b = el.select((col("vec_id") - 1).as("vec_id"), col("dim"),
      col("xm").as("xb"))
    val cosm = a.join(b, Seq("vec_id", "dim"))
      .groupBy("vec_id")
      .agg(sum(expr("xa * xb")).as("dot"),
        sum(expr("xa * xa")).as("na2"),
        sum(expr("xb * xb")).as("nb2"))
      .withColumn("cos_micro", expr(
        "cast(round(cast(dot as double)" +
          " / (sqrt(cast(na2 as double)) * sqrt(cast(nb2 as double)))" +
          " * 1e6) as bigint)"))
      .agg(count(lit(1)).as("n_pairs"),
        sum("cos_micro").as("sum_cos"))
    cosm.crossJoin(broadcast(marg)).crossJoin(broadcast(nv))
      // signed mean — pmod-floor so truncate/floor engines agree
      .withColumn("mean_pair_cos_micro",
        expr("(sum_cos - pmod(sum_cos, n_pairs)) div n_pairs"))
      .withColumn("anis_micro", expr(
        "cast(round(cast(sum_s1sq as double)" +
          " / (cast(n as double) * cast(sum_s2 as double)) * 1e6)" +
          " as bigint)"))
      .select(col("n").as("n_vecs"), col("n_pairs"),
        col("mean_pair_cos_micro"), col("anis_micro"))
  }

  // ---------------------------------------------------------------
  // eval_fleiss_kappa
  // ---------------------------------------------------------------

  /** Fleiss' kappa across three deterministic quality judges — the
    * multi-rater agreement statistic an LLM-judge ensemble is audited
    * with (Cohen's kappa, already in the catalog, only handles two).
    * Judges (each a self-contained binary rule over a document):
    * J1 length (n_chars ≥ 200), J2 lexical diversity (distinct
    * words ≥ half of words), J3 stopword signal (≥ 2 hits of the 7-
    * word EN stopword list). For m = 3 binary raters the per-item
    * agreement Σnᵢⱼ(nᵢⱼ−1) is 6 (unanimous) or 2 (2-1 split), so
    * P̄·6N = Σ of those integers exactly. P̄ₑ is computed on the
    * quantized mean-vote-rate lattice q₁ = ⌊S₁·10⁶ / 3N⌋ (∈ [0, 10⁶]):
    * P̄ₑ_micro = ⌊(q₁² + (10⁶−q₁)²) / 10⁶⌋, and κ_micro =
    * pmod-floor((P̄−P̄ₑ)·10⁶ / (10⁶−P̄ₑ)) — every squared term is
    * bounded by ~10¹² INDEPENDENT of N (the earlier exact
    * S₁²+(3N−S₁)² form overflowed BIGINT near N ≈ 10⁶ docs, round-9
    * ADVICE). Remaining N-scaled products A·10⁶ ≤ 6N·10⁶ and
    * S₁·10⁶ ≤ 3N·10⁶ stay inside BIGINT to N ≈ 1.5·10¹² documents —
    * genuinely 100 TB-safe.
    *
    * 100 TB shape: one corpus pass computes all three votes per doc
    * (the tokenizer is shared), collapsing to a 1-row moment
    * aggregate; kappa is arithmetic on that row.
    */
  /** The three deterministic binary judges over `documents` — shared
    * by `eval_fleiss_kappa` and `eval_cochran_q` (Ext88Queries) so
    * the two agreement statistics audit the SAME rater panel.
    */
  private[graft] def judgeVotes(spark: SparkSession,
      dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks",
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
      .withColumn("j1",
        when(col("n_chars") >= 200, 1L).otherwise(0L))
      .withColumn("j2",
        when(size(array_distinct(col("toks"))) * 2 >= size(col("toks")),
          1L).otherwise(0L))
      .withColumn("j3", when(
        size(filter(col("toks"), x => x.isin(
          TextAnalysis.enStopwords.map(lit): _*))) >= 2, 1L)
        .otherwise(0L))
      .withColumn("n1", col("j1") + col("j2") + col("j3"))

  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val docs = judgeVotes(spark, dir)
      .withColumn("agree",
        expr("n1 * (n1 - 1) + (3 - n1) * (2 - n1)"))
    docs.agg(count(lit(1)).as("n_docs"),
        sum("j1").as("n_j1"), sum("j2").as("n_j2"),
        sum("j3").as("n_j3"),
        sum("n1").as("s1"), sum("agree").as("a"))
      .withColumn("p_bar_micro", expr("(a * 1000000) div (6 * n_docs)"))
      .withColumn("q1", expr("(s1 * 1000000) div (3 * n_docs)"))
      .withColumn("p_e_micro", expr(
        "(q1 * q1 + (1000000 - q1) * (1000000 - q1)) div 1000000"))
      // kappa can be negative (below-chance agreement) — pmod-floor
      // the division so Spark `div` (truncate) and DuckDB `//`
      // (floor) take the same lattice point
      .withColumn("kn", expr("(p_bar_micro - p_e_micro) * 1000000"))
      .withColumn("kd", expr("greatest(1000000 - p_e_micro, 1)"))
      .withColumn("kappa_micro", expr("(kn - pmod(kn, kd)) div kd"))
      .select("n_docs", "n_j1", "n_j2", "n_j3", "p_bar_micro",
        "p_e_micro", "kappa_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_exposure_fairness" -> exposureFairness _,
    "ts_ljung_box" -> ljungBox _,
    "eval_fleiss_kappa" -> fleissKappa _,
    "ts_pacf" -> pacf _,
    "ts_perm_entropy" -> permEntropy _,
    "embed_anisotropy" -> anisotropy _,
  )

  val oracle: Map[String, String] = Map(
    "eval_exposure_fairness" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x)
        |    AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY ROUND(d.dot / (nq.nrm * ne.nrm), 6) DESC, n_id)
        |      AS rank
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), hits AS (
        |  SELECT r.n_id, r.rank, e.label,
        |    CAST(ROUND(1e6 * ln(2.0) / ln(CAST(r.rank AS DOUBLE) + 1))
        |      AS BIGINT) AS disc_micro
        |  FROM ranked r JOIN embeddings e ON e.vec_id = r.n_id
        |  WHERE r.rank <= 10
        |), exp AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_hits,
        |    CAST(SUM(disc_micro) AS BIGINT) AS exp_sum
        |  FROM hits GROUP BY label
        |), exp_tot AS (
        |  SELECT CAST(SUM(exp_sum) AS BIGINT) AS exp_tot FROM exp
        |), corpus AS (
        |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_corpus
        |  FROM embeddings GROUP BY label
        |), n_tot AS (
        |  SELECT CAST(SUM(n_corpus) AS BIGINT) AS n_tot FROM corpus)
        |SELECT c.label, c.n_corpus,
        |  (c.n_corpus * 1000000) // t.n_tot AS corpus_share_micro,
        |  COALESCE(x.n_hits, 0) AS n_hits,
        |  (COALESCE(x.exp_sum, 0) * 1000000) // e.exp_tot
        |    AS exp_share_micro,
        |  (COALESCE(x.exp_sum, 0) * 1000000) // e.exp_tot
        |    - (c.n_corpus * 1000000) // t.n_tot AS skew_micro
        |FROM corpus c
        |LEFT JOIN exp x ON x.label = c.label
        |CROSS JOIN n_tot t
        |CROSS JOIN exp_tot e
        |ORDER BY c.label""".stripMargin,
    "ts_ljung_box" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM c
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi)) AS hr FROM bounds
        |), s AS (
        |  SELECT sp.hr, COALESCE(c.cnt, 0) AS cnt
        |  FROM spine sp LEFT JOIN c ON c.hr = sp.hr
        |), g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cnt) AS BIGINT) AS sm,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS sxx
        |  FROM s
        |), lags AS (
        |  SELECT unnest(range(1, 11)) AS lag
        |), p AS (
        |  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(a.cnt) AS BIGINT) AS sxh,
        |    CAST(SUM(bb.cnt) AS BIGINT) AS sxt,
        |    CAST(SUM(a.cnt * bb.cnt) AS BIGINT) AS sxy
        |  FROM lags l
        |  JOIN s a ON TRUE
        |  JOIN s bb ON bb.hr = a.hr + l.lag
        |  GROUP BY l.lag
        |), r AS (
        |  SELECT lag, n_pairs,
        |    CAST(ROUND(CAST(g.n * g.n * sxy - g.n * g.sm * (sxh + sxt)
        |      + n_pairs * g.sm * g.sm AS DOUBLE)
        |      / CAST(GREATEST(g.n * g.n * g.sxx - g.n * g.sm * g.sm, 1)
        |        AS DOUBLE)
        |      * 1e6) AS BIGINT) AS rho_micro,
        |    g.n AS n
        |  FROM p CROSS JOIN g
        |), q AS (
        |  SELECT lag, n_pairs, rho_micro, n,
        |    CAST(SUM((rho_micro * rho_micro) // (n - lag)) OVER (
        |      ORDER BY lag ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM r)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs, rho_micro,
        |  CAST((n * (n + 2) * cum) // 1000000 AS BIGINT) AS q_micro
        |FROM q ORDER BY lag""".stripMargin,
    "eval_fleiss_kappa" ->
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
        |), r AS (
        |  SELECT j1, j2, j3, j1 + j2 + j3 AS n1,
        |    (j1 + j2 + j3) * (j1 + j2 + j3 - 1)
        |      + (3 - j1 - j2 - j3) * (2 - j1 - j2 - j3) AS agree
        |  FROM j
        |), m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(j1) AS BIGINT) AS n_j1,
        |    CAST(SUM(j2) AS BIGINT) AS n_j2,
        |    CAST(SUM(j3) AS BIGINT) AS n_j3,
        |    CAST(SUM(n1) AS BIGINT) AS s1,
        |    CAST(SUM(agree) AS BIGINT) AS a
        |  FROM r
        |), e AS (
        |  SELECT *,
        |    (a * 1000000) // (6 * n_docs) AS p_bar_micro,
        |    (q1 * q1 + (1000000 - q1) * (1000000 - q1)) // 1000000
        |      AS p_e_micro
        |  FROM (SELECT *, (s1 * 1000000) // (3 * n_docs) AS q1 FROM m)
        |), k AS (
        |  SELECT *,
        |    (p_bar_micro - p_e_micro) * 1000000 AS kn,
        |    GREATEST(1000000 - p_e_micro, 1) AS kd
        |  FROM e)
        |SELECT n_docs, n_j1, n_j2, n_j3, p_bar_micro, p_e_micro,
        |  (kn - ((kn % kd) + kd) % kd) // kd AS kappa_micro
        |FROM k""".stripMargin,
    "ts_pacf" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM c
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi)) AS hr FROM bounds
        |), s AS (
        |  SELECT sp.hr, COALESCE(c.cnt, 0) AS cnt
        |  FROM spine sp LEFT JOIN c ON c.hr = sp.hr
        |), g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(cnt) AS BIGINT) AS sm,
        |    CAST(SUM(cnt * cnt) AS BIGINT) AS sxx
        |  FROM s
        |), lags AS (
        |  SELECT unnest(range(1, 4)) AS lag
        |), p AS (
        |  SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(a.cnt) AS BIGINT) AS sxh,
        |    CAST(SUM(bb.cnt) AS BIGINT) AS sxt,
        |    CAST(SUM(a.cnt * bb.cnt) AS BIGINT) AS sxy
        |  FROM lags l
        |  JOIN s a ON TRUE
        |  JOIN s bb ON bb.hr = a.hr + l.lag
        |  GROUP BY l.lag
        |), r AS (
        |  SELECT lag,
        |    CAST(ROUND(CAST(g.n * g.n * sxy - g.n * g.sm * (sxh + sxt)
        |      + n_pairs * g.sm * g.sm AS DOUBLE)
        |      / CAST(GREATEST(g.n * g.n * g.sxx - g.n * g.sm * g.sm, 1)
        |        AS DOUBLE)
        |      * 1e6) AS BIGINT) AS rho_micro
        |  FROM p CROSS JOIN g
        |), piv AS (
        |  SELECT MAX(CASE WHEN lag = 1 THEN rho_micro END) AS r1,
        |    MAX(CASE WHEN lag = 2 THEN rho_micro END) AS r2,
        |    MAX(CASE WHEN lag = 3 THEN rho_micro END) AS r3
        |  FROM r
        |), f AS (
        |  SELECT *, CAST(ROUND(
        |    CAST(r2 * 1000000 - r1 * r1 AS DOUBLE)
        |    / CAST(GREATEST(1000000000000 - r1 * r1, 1) AS DOUBLE)
        |    * 1e6) AS BIGINT) AS f22
        |  FROM piv
        |), f2 AS (
        |  SELECT *, CAST(ROUND(
        |    CAST(r1 * (1000000 - f22) AS DOUBLE) / 1e6) AS BIGINT)
        |    AS f21
        |  FROM f
        |), f3 AS (
        |  SELECT *, CAST(ROUND(
        |    CAST(r3 * 1000000 - f21 * r2 - f22 * r1 AS DOUBLE)
        |    / CAST(GREATEST(1000000000000 - f21 * r1 - f22 * r2, 1)
        |      AS DOUBLE)
        |    * 1e6) AS BIGINT) AS f33
        |  FROM f2)
        |SELECT CAST(1 AS BIGINT) AS lag, r1 AS rho_micro,
        |  r1 AS pacf_micro FROM f3
        |UNION ALL SELECT 2, r2, f22 FROM f3
        |UNION ALL SELECT 3, r3, f33 FROM f3
        |ORDER BY lag""".stripMargin,
    "ts_perm_entropy" ->
      """WITH c AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), bounds AS (
        |  SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM c
        |), spine AS (
        |  SELECT unnest(generate_series(lo, hi)) AS hr FROM bounds
        |), s AS (
        |  SELECT sp.hr, COALESCE(c.cnt, 0) AS cnt
        |  FROM spine sp LEFT JOIN c ON c.hr = sp.hr
        |), tri AS (
        |  SELECT a.cnt AS x0, b.cnt AS x1, d.cnt AS x2
        |  FROM s a
        |  JOIN s b ON b.hr = a.hr + 1
        |  JOIN s d ON d.hr = a.hr + 2
        |), pat AS (
        |  SELECT CAST(
        |    ((CASE WHEN x1 < x0 THEN 1 ELSE 0 END)
        |      + (CASE WHEN x2 < x0 THEN 1 ELSE 0 END)) * 9
        |    + ((CASE WHEN x0 <= x1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN x2 < x1 THEN 1 ELSE 0 END)) * 3
        |    + (CASE WHEN x0 <= x2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN x1 <= x2 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS pattern
        |  FROM tri
        |), g AS (
        |  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pat GROUP BY pattern
        |), q AS (
        |  SELECT pattern, n,
        |    CAST(ROUND(ln(n) * 1e6) AS BIGINT) AS lnn_micro,
        |    CAST(SUM(n) OVER () AS BIGINT) AS n_tri,
        |    CAST(SUM(n * CAST(ROUND(ln(n) * 1e6) AS BIGINT))
        |      OVER () AS BIGINT) AS sum_nlnn
        |  FROM g)
        |SELECT pattern, n, (n * 1000000) // n_tri AS share_micro,
        |  CAST(ROUND(ln(n_tri) * 1e6) AS BIGINT)
        |    - sum_nlnn // n_tri AS h_micro
        |FROM q ORDER BY pattern""".stripMargin,
    "embed_anisotropy" ->
      """WITH el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1)
        |      AS BIGINT) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
        |      AS BIGINT) AS xm
        |  FROM embeddings
        |), marg AS (
        |  SELECT CAST(SUM(s1 * s1) AS BIGINT) AS sum_s1sq,
        |    CAST(SUM(s2) AS BIGINT) AS sum_s2
        |  FROM (
        |    SELECT dim, CAST(SUM(xm) AS BIGINT) AS s1,
        |      CAST(SUM(xm * xm) AS BIGINT) AS s2
        |    FROM el GROUP BY dim)
        |), nv AS (
        |  SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM el
        |), cos AS (
        |  SELECT a.vec_id,
        |    CAST(SUM(a.xm * b.xm) AS BIGINT) AS dot,
        |    CAST(SUM(a.xm * a.xm) AS BIGINT) AS na2,
        |    CAST(SUM(b.xm * b.xm) AS BIGINT) AS nb2
        |  FROM el a JOIN el b ON b.vec_id = a.vec_id + 1
        |    AND b.dim = a.dim
        |  GROUP BY a.vec_id
        |), cm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CAST(ROUND(CAST(dot AS DOUBLE)
        |      / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
        |      * 1e6) AS BIGINT)) AS BIGINT) AS sum_cos
        |  FROM cos)
        |SELECT nv.n AS n_vecs, cm.n_pairs,
        |  (cm.sum_cos - ((cm.sum_cos % cm.n_pairs) + cm.n_pairs)
        |    % cm.n_pairs) // cm.n_pairs AS mean_pair_cos_micro,
        |  CAST(ROUND(CAST(m.sum_s1sq AS DOUBLE)
        |    / (CAST(nv.n AS DOUBLE) * CAST(m.sum_s2 AS DOUBLE))
        |    * 1e6) AS BIGINT) AS anis_micro
        |FROM cm CROSS JOIN marg m CROSS JOIN nv""".stripMargin,
  )
}
