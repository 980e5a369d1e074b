package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch 5: robust statistics + audit operators — the
  * distribution-shaped checks a curation pipeline runs on numeric
  * columns before trusting them (reference analog: the validation
  * stage, CdcMsgParser.java:160-221, generalized from schema checks to
  * distributional checks).
  *
  *  - `q58_weighted_median`: exact weighted median (cumulative-weight
  *    rule) — the robust center for weighted samples; integer-exact
  *    because weights and the value lattice are integers and the
  *    selection rule (`2·cumw >= totw`) never divides.
  *  - `dq_mad_outliers`: median / MAD / 3-MAD outlier counts per
  *    group — the robust z-score. Medians use the same cumulative
  *    rule (lowest value whose 2·cumcount >= n), NOT percentile_disc,
  *    so the Spark and DuckDB answers agree by integer construction
  *    rather than by matching interpolation conventions.
  *  - `ts_acf`: autocorrelation of the hourly event-count series at
  *    lags 1..3 — integer moment sums (q51's pattern) with one
  *    rounded division at the end; the hour-index equi-join aligns
  *    lagged pairs even across missing hours.
  *  - `dq_benford`: first-significant-digit audit of order totals
  *    against Benford's law — the classic fraud / synthetic-data
  *    smell test. Expected shares are 1e-6-lattice literals that sum
  *    to exactly 1,000,000.
  *  - `sim_mips_topk`: maximum-inner-product top-k retrieval — the
  *    un-normalized sibling of `sim_cosine_topk` (what you run when
  *    magnitude IS signal, e.g. popularity-weighted recommenders).
  *
  * 100 TB shapes: weighted-median/MAD collapse the corpus with
  * group+value-keyed aggregates (bounded by the value lattice per
  * group), then run windows on the collapsed table only; ACF
  * aggregates to a bounded series (hours in the data's time range)
  * before any self-join; Benford is one 9-row aggregate; MIPS is the
  * brute-force baseline, corpus x broadcast-query-sample only — the
  * scale path is the same SRP/IVF bucketing as cosine ANN.
  */
object Ext12Queries {

  /** Lowest `valCol` whose doubled cumulative weight reaches the group
    * total. `2·cw >= tw` (not `>`): for even total weight this picks
    * the LOWER weighted-median candidate — matching percentile_disc's
    * lower-value convention. Pre-aggregating by (group, value)
    * collapses ties so the cumulative window is over distinct values.
    *
    * Scale note: the per-group cumulative window is a single task per
    * group, so its input must be DOMAIN-bounded, not corpus-bounded —
    * true here because the value lattice is finite (price cents ≤
    * ~1e7 distinct, event milli-values ≤ ~1e6) and the groupBy
    * collapses the corpus to it first. For an unbounded value domain
    * the same selection rule runs on a coarse-to-fine histogram
    * (bin-count pass → recurse into the median bin) — same answers,
    * O(log) corpus passes, no single-task scan.
    */
  private def weightedMedianBy(df: DataFrame, grpCol: String,
      valCol: String, wCol: String, outCol: String): DataFrame = {
    val byVal = df.groupBy(col(grpCol), col(valCol))
      .agg(sum(col(wCol)).as("wv"))
    val cum = byVal
      .withColumn("cw", sum("wv").over(Window.partitionBy(grpCol)
        .orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum("wv").over(Window.partitionBy(grpCol)))
    cum.filter(col("cw") * 2 >= col("tw"))
      .groupBy(col(grpCol))
      .agg(min(col(valCol)).as(outCol), max("tw").as("total_w"))
  }

  /** Weighted median of lineitem extended price (cents lattice),
    * weighted by quantity, per return flag. The quantity weights are
    * integral by construction (TPC-H quantities are whole units).
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"),
        expr("cast(round(l_extendedprice * 100) as bigint)")
          .as("cents"),
        expr("cast(round(l_quantity) as bigint)").as("w"))
    weightedMedianBy(li, "grp", "cents", "w", "wmedian_cents")
      .select("grp", "total_w", "wmedian_cents")
      .orderBy("grp")
  }

  /** Median / MAD / 3-MAD outlier count of event values (1e-3
    * lattice) per event type. Three group-keyed passes: value
    * median, deviation median (MAD), then the outlier count — each a
    * hash aggregate + a window over the collapsed (group, value)
    * table, never a per-row window over the corpus.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val med = weightedMedianBy(e.withColumn("one", lit(1L)),
      "event_type", "vm", "one", "med_vm")
      .select("event_type", "med_vm")
    val dev = e.join(med, "event_type")
      .withColumn("dev", abs(col("vm") - col("med_vm")))
    val mad = weightedMedianBy(dev.withColumn("one", lit(1L)),
      "event_type", "dev", "one", "mad_vm")
      .select("event_type", "mad_vm")
    dev.join(mad, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), max("med_vm").as("med_vm"),
        max("mad_vm").as("mad_vm"),
        sum(when(col("dev") > col("mad_vm") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  /** Autocorrelation of the hourly event-count series at lags 1..3:
    * pairs aligned by hour INDEX (hr, hr+lag) so gaps in the series
    * drop the pair instead of silently shifting it; Pearson r from
    * integer moment sums with one rounded division (q51's contract).
    * The series is bounded by the corpus time range (not its row
    * count), so the per-lag equi-joins run on a tiny aggregate.
    */
  def acf(spark: SparkSession, dir: String): DataFrame = {
    val series = t(spark, dir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
    val lagged = (1 to 3).map { lg =>
      series.select(col("hr"), col("cnt").as("x"))
        .join(series.select((col("hr") - lg).as("hr"),
          col("cnt").as("y")), "hr")
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(lit(lg.toLong).as("lag"), col("n"), col("sx"),
          col("sy"), col("sxx"), col("syy"), col("sxy"))
        // a lag past the series' end yields Spark's 1-row global agg
        // but no GROUP BY row in the oracle — drop it in both worlds
        .filter(col("n") > 0)
    }.reduce(_ unionAll _)
    lagged.withColumn("acf_r6", expr(
      """round(CAST(n * sxy - sx * sy AS DOUBLE)
        | / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)"""
        .stripMargin))
      .select("lag", "n", "sx", "sy", "sxx", "syy", "sxy", "acf_r6")
      .orderBy("lag")
  }

  /** Benford expected first-digit share on the 1e-6 lattice:
    * round(log10(1 + 1/d)·1e6). The nine literals sum to exactly
    * 1,000,000, so `delta_micro` is a true decomposition of the
    * distributional distance.
    */
  private val benfordMicro: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
    5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** First-significant-digit distribution of order totals (cents
    * lattice) vs Benford's law. Digit extraction is string-based on
    * the positive integer cents — exact in any engine. One 9-row
    * aggregate; the whole-set window computes the total in-plan.
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val digits = t(spark, dir, "orders")
      .select(expr(
        "cast(substring(cast(cast(round(o_totalprice * 100) as bigint)"
          + " as string), 1, 1) as bigint)").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val expected = benfordMicro.foldLeft(lit(null).cast("bigint")) {
      case (acc, (d, m)) => when(col("digit") === d, lit(m)).otherwise(acc)
    }
    digits
      .withColumn("total", sum("n").over(Window.partitionBy()))
      .withColumn("share_micro", expr("(n * 1000000) div total"))
      .withColumn("benford_micro", expected)
      .withColumn("delta_micro",
        col("share_micro") - col("benford_micro"))
      .select("digit", "n", "share_micro", "benford_micro",
        "delta_micro")
      .orderBy("digit")
  }

  /** Brute-force maximum-inner-product top-k for a broadcast query
    * sample: `sim_cosine_topk` without the norm division — rank by
    * the raw dot product (rounded to the 1e-6 lattice for
    * cross-engine parity, ties broken by neighbour id).
    */
  def mipsTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val c = emb.select(col("vec_id").as("n_id"),
      col("embedding").as("n_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("ip").desc, col("n_id"))
    c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("ip",
        round(Similarity.dot(col("q_vec"), col("n_vec")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("n_id"), col("ip"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** Rank-family window surface: percent_rank / cume_dist / nth_value
    * over a per-priority TOTAL order (price cents, then order key) so
    * every rank is unique and both engines emit identical doubles —
    * `(rank-1)/(n-1)` and `rank/n` on integer inputs are exact IEEE
    * divisions, rounded to the 1e-6 lattice anyway for the contract.
    * `nth_value` needs the full-partition frame spelled out (the
    * default frame stops at the current row in both engines).
    */
  def windowRankFns(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .filter(col("o_custkey") % 20 === 0)
      .select(col("o_orderkey"), col("o_orderpriority").as("prio"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val w = Window.partitionBy("prio")
      .orderBy(col("cents"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    base
      .withColumn("pr_r6", round(percent_rank().over(w), 6))
      .withColumn("cd_r6", round(cume_dist().over(w), 6))
      .withColumn("third_cents", nth_value(col("cents"), 3).over(wFull))
      .orderBy("prio", "cents", "o_orderkey")
  }

  /** Time-to-next-purchase attribution: each event joined to the
    * user's EARLIEST purchase at-or-after its time — the forward twin
    * of `q14_asof_attrib`, exercising [[AsOf.asofJoinForward]] (union
    * + ONE key shuffle + reverse-time carry; no range-join blowup).
    * The purchase side is deduped per (user, ts) with min-event-id
    * tie-breaks so the as-of pick is total.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        graft.Tables.eventsTsMicros.as("ts"), col("event_type"),
        round(col("value") * 1000).cast("long").as("vm"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("next_seq"),
        min_by(col("vm"), col("event_id")).as("next_vm"))
    AsOf.asofJoinForward(
        ev.select("event_id", "user_id", "ts"), purchases,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        payload = Seq("next_seq", "next_vm"))
      .select("event_id", "user_id", "next_seq", "next_vm")
      .orderBy("event_id")
  }

  /** Per-document letter-distribution Shannon entropy in exact
    * integer micro-nats: each distinct count's ln is quantized to the
    * 1e-6 lattice ONCE (unigramLogprob's portability contract), so
    * the per-doc sum is order-independent integer math and
    * `h_micro = ln(n)·1e6 - (Σ c·ln(c)·1e6) div n` is engine-exact.
    * Low-entropy docs are the repetition/boilerplate smell the
    * quality gate wants. Documents with no [a-z] letters are absent
    * (entropy undefined). One (doc, letter)-keyed aggregate — the
    * letter domain bounds state at 26/doc.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(
        expr("regexp_extract_all(lower(text), '[a-z]', 0)")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .withColumn("lnc_micro",
        round(log(col("c").cast("double")) * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_letters"),
        sum(col("c") * col("lnc_micro")).as("sum_clnc_micro"))
      .withColumn("h_micro",
        round(log(col("n_letters").cast("double")) * 1e6).cast("long")
          - expr("sum_clnc_micro div n_letters"))
      .select("doc_id", "n_letters", "h_micro")
      .orderBy("doc_id")

  /** Calibration curve of the language-ID classifier over its own
    * confidence proxy (the stopword-vote margin |en_hits − es_hits|,
    * clamped to 5+): per margin bucket, how often is the guess right?
    * The reliability diagram a model-driven filter needs BEFORE its
    * confidence threshold means anything — a well-calibrated
    * classifier's accuracy rises with the margin; a flat curve says
    * the margin is noise. Bounded: ≤ 6 rows out of one hash
    * aggregate over doc-level features (no shuffle of the corpus
    * beyond the count collapse).
    */
  def evalCalibration(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(t(spark, dir, "documents"), "text")
      .select(col("lang"), col("lang_guess"),
        least(abs(col("en_hits") - col("es_hits")), lit(5L))
          .as("margin"))
      .groupBy("margin")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lang_guess") === col("lang"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_micro", expr("(n_correct * 1000000) div n"))
      .orderBy("margin")

  /** STL-lite seasonal decomposition of the hourly event-count
    * series: trend = centered 25-hour moving average over the hour
    * INDEX (RANGE frame, so missing hours shrink the window rather
    * than shifting it; only full windows kept), seasonal = per
    * hour-of-day mean of the detrended residual. All sums are exact
    * integers on the 1e-3 lattice (`sum25·1000 div 25` is exact for
    * the full window; operands are positive so trunc == floor in
    * both engines); the only double is the final rounded mean. The
    * corpus collapses to the bounded hour series before any window.
    */
  def stlTrend(spark: SparkSession, dir: String): DataFrame = {
    val series = t(spark, dir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
    val w25 = Window.orderBy("hr").rangeBetween(-12, 12)
    series
      .withColumn("n25", count(lit(1)).over(w25))
      .withColumn("sum25", sum("cnt").over(w25))
      .filter(col("n25") === 25)
      .withColumn("det_milli",
        col("cnt") * 1000 - expr("(sum25 * 1000) div 25"))
      .withColumn("hod", expr("hr % 24"))
      .groupBy("hod")
      .agg(count(lit(1)).as("n_hours"),
        sum("det_milli").as("sum_det_milli"))
      .withColumn("seasonal_r6", round(
        col("sum_det_milli").cast("double")
          / col("n_hours").cast("double") / 1000.0, 6))
      .orderBy("hod")
  }

  /** Per-document 3-gram novelty: the fraction of a document's
    * distinct shingles it is the FIRST owner of (lowest doc_id) — the
    * curation-side novelty/redundancy score (a late near-duplicate
    * scores ~0; the template boilerplate everyone shares is charged
    * to its earliest document). Shape: one shingle-keyed min
    * aggregate + one join back on the shingle dimension + a per-doc
    * aggregate — the inverted-index pattern, never all-pairs.
    * Documents with no shingles (< 3 tokens) are absent.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(t(spark, dir, "documents"), "doc_id",
      "text", n = 3)
    val firstOwner = sh.groupBy("shingle")
      .agg(min("id").as("first_id"))
    sh.join(firstOwner, "shingle")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("id") === col("first_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_micro",
        expr("(n_novel * 1000000) div n_shingles"))
      .orderBy("doc_id")
  }

  /** Kaplan-Meier-lite user survival: for each horizon k (days), the
    * fraction of users whose observed lifetime (last event day −
    * first event day) reaches k. One per-user aggregate collapses the
    * corpus; the 15-row horizon spine rides an explode (narrow
    * Generate — no join, no BNLJ), so the curve is one more hash
    * aggregate over users × 15.
    */
  def survivalCurve(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("user_id"),
        expr("((ts div 1000)) div 86400000000").as("day"))
      .groupBy("user_id")
      .agg((max("day") - min("day")).as("life"))
      .withColumn("k", explode(sequence(lit(0L), lit(14L))))
      .groupBy("k")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("life") >= col("k"), 1L).otherwise(0L))
          .as("n_surviving"))
      .withColumn("surv_micro",
        expr("(n_surviving * 1000000) div n_users"))
      .orderBy("k")

  /** Top-25 token collocations by pointwise mutual information
    * (adjacent-bigram PMI, the classic collocation extractor):
    * PMI = ln(c_ab·N / (c_a·c_b)), quantized once per bigram on the
    * 1e-6 micro-nat lattice (unigramLogprob's portability contract).
    * Rare-pair noise is cut by the standard c_ab >= 5 floor; the
    * result is TakeOrdered top-k, never a global sort. Shapes: one
    * bigram + one unigram hash aggregate (vocabulary-sized), one
    * join of bigrams to unigram counts per side.
    */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(lower(col("text"))))
          .as(Seq("pos", "tok")))
    // adjacency via a per-doc lead window — ONE key shuffle of the
    // token stream, not a token-level self-join (two shuffles)
    val bi = toks
      .withColumn("b", lead(col("tok"), 1).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("b").isNotNull)
      .select(col("tok").as("a"), col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val n = bi.groupBy().agg(sum("c_ab").as("n_bi"))
    bi.filter(col("c_ab") >= 5)
      .join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
      .crossJoin(broadcast(n))
      .withColumn("pmi_micro", round(
        log(col("c_ab").cast("double") * col("n_bi").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double")))
          * 1e6).cast("long"))
      .select("a", "b", "c_ab", "c_a", "c_b", "pmi_micro")
      .orderBy(col("pmi_micro").desc, col("a"), col("b"))
      .limit(25)
  }

  /** Threshold (range) vector search: every corpus vector within
    * cosine >= 0.3 of each broadcast probe — the standard API sibling
    * of top-k retrieval (what you run when the budget is a QUALITY
    * bar, not a result count). Same broadcast-probe brute-force
    * baseline as `sim_cosine_topk`; the scale path is the same
    * SRP/IVF bucketing.
    */
  def rangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
    val c = emb.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"))
      .withColumn("n_nrm", Similarity.norm(col("n_vec")))
    c.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("sim", round(
        Similarity.dot(col("q_vec"), col("n_vec"))
          / (col("q_nrm") * col("n_nrm")), 6))
      .filter(col("sim") >= 0.3)
      .select("q_id", "n_id", "sim")
      .orderBy("q_id", "n_id")
  }

  /** Daily row-count anomaly monitor: robust-free trailing z-score of
    * each day's event count against the previous 7 days (integer
    * moment sums, full windows only — ev_anomaly_zscore's contract
    * lifted from per-user values to the pipeline's own volume). The
    * |z| > 3 flag is the "did ingestion break today" page. Corpus
    * collapses to the bounded day series before any window.
    */
  def rowAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .select(expr("(ts div 1000) div 86400000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    days
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win", sum("cnt").over(w))
      .withColumn("sumsq_win", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("n_win") === 7)
      // z = (cnt − mean)/σ_pop in one exact-integer rearrangement:
      // (7·cnt − sum) / sqrt(7·sumsq − sum²); NULL for a
      // zero-variance window instead of a NaN
      .withColumn("z_r6",
        when(col("sumsq_win") * 7 === col("sum_win") * col("sum_win"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("cnt") * 7 - col("sum_win")).cast("double")
              / sqrt((col("sumsq_win") * 7 - col("sum_win")
                * col("sum_win")).cast("double")), 6)))
      .withColumn("is_anomaly", abs(col("z_r6")) > 3.0)
      .select("day", "cnt", "sum_win", "sumsq_win", "z_r6",
        "is_anomaly")
      .orderBy("day")
  }

  /** Rolling 7-day active users (trailing WAU per day) — the classic
    * sliding DISTINCT, which no window frame can compute because
    * distinct is not subtractable. The scale-correct shape: collapse
    * to (user, day) presence, explode each presence into the ≤ 7
    * windows it serves (bounded 7× amplification of the ALREADY
    * collapsed table, not the corpus), then one exact distinct count
    * per window day. Trailing windows past the data's last day are
    * cut by a plan-embedded 1-row max-day broadcast.
    */
  def activeUsers7d(spark: SparkSession, dir: String): DataFrame = {
    val ud = t(spark, dir, "events")
      .select(col("user_id"),
        expr("(ts div 1000) div 86400000000").as("day"))
      .distinct()
    val mx = broadcast(ud.agg(max("day").as("mxd")))
    ud.withColumn("w_day",
        explode(sequence(col("day"), col("day") + 6)))
      .crossJoin(mx)
      .filter(col("w_day") <= col("mxd"))
      .groupBy("w_day")
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("w_day")
  }

  /** Interpolated (continuous) percentiles per group — the
    * percentile_cont surface next to q52's percentile_disc; results
    * rounded to the 1e-6 lattice since interpolation is the one step
    * where engines may differ in the last ulp.
    */
  def percentileCont(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
        |    AS p50_r6,
        |  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6)
        |    AS p90_r6
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q58_weighted_median" -> weightedMedian _,
    "dq_mad_outliers" -> madOutliers _,
    "ts_acf" -> acf _,
    "dq_benford" -> benford _,
    "sim_mips_topk" -> mipsTopK _,
    "q59_window_rank_fns" -> windowRankFns _,
    "q60_asof_forward" -> asofForward _,
    "text_char_entropy" -> charEntropy _,
    "eval_calibration" -> evalCalibration _,
    "ts_stl_trend" -> stlTrend _,
    "text_ngram_novelty" -> ngramNovelty _,
    "ev_survival_curve" -> survivalCurve _,
    "text_pmi_collocations" -> pmiCollocations _,
    "sim_range_search" -> rangeSearch _,
    "dq_row_anomaly" -> rowAnomaly _,
    "ev_active_users_7d" -> activeUsers7d _,
    "q61_percentile_cont" -> percentileCont _,
  )

  val oracle: Map[String, String] = Map(
    "q58_weighted_median" ->
      """WITH b AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
        |    CAST(ROUND(l_quantity) AS BIGINT) AS w
        |  FROM lineitem
        |), g AS (
        |  SELECT grp, cents, CAST(SUM(w) AS BIGINT) AS wv
        |  FROM b GROUP BY grp, cents
        |), c AS (
        |  SELECT grp, cents, wv,
        |    CAST(SUM(wv) OVER (PARTITION BY grp ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cw,
        |    CAST(SUM(wv) OVER (PARTITION BY grp) AS BIGINT) AS tw
        |  FROM g)
        |SELECT grp, MAX(tw) AS total_w, MIN(cents) AS wmedian_cents
        |FROM c WHERE cw * 2 >= tw
        |GROUP BY grp
        |ORDER BY grp""".stripMargin,
    "dq_mad_outliers" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), gv AS (
        |  SELECT event_type, vm, COUNT(*) AS c FROM e
        |  GROUP BY event_type, vm
        |), cv AS (
        |  SELECT event_type, vm,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY vm
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(c) OVER (PARTITION BY event_type) AS tw
        |  FROM gv
        |), med AS (
        |  SELECT event_type, MIN(vm) AS med_vm FROM cv
        |  WHERE cw * 2 >= tw GROUP BY event_type
        |), d AS (
        |  SELECT e.event_type, e.vm, med.med_vm,
        |    ABS(e.vm - med.med_vm) AS dev
        |  FROM e JOIN med ON e.event_type = med.event_type
        |), gd AS (
        |  SELECT event_type, dev, COUNT(*) AS c FROM d
        |  GROUP BY event_type, dev
        |), cd AS (
        |  SELECT event_type, dev,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY dev
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    SUM(c) OVER (PARTITION BY event_type) AS tw
        |  FROM gd
        |), mad AS (
        |  SELECT event_type, MIN(dev) AS mad_vm FROM cd
        |  WHERE cw * 2 >= tw GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n,
        |  MAX(d.med_vm) AS med_vm, MAX(mad.mad_vm) AS mad_vm,
        |  CAST(SUM(CASE WHEN d.dev > mad.mad_vm * 3 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN mad ON d.event_type = mad.event_type
        |GROUP BY d.event_type
        |ORDER BY d.event_type""".stripMargin,
    "ts_acf" ->
      """WITH s AS (
        |  SELECT (epoch_us(ts) // 3600000000) AS hr, COUNT(*) AS cnt
        |  FROM events GROUP BY 1
        |), lags AS (
        |  SELECT 1 AS lag UNION ALL SELECT 2 UNION ALL SELECT 3
        |), p AS (
        |  SELECT l.lag, a.cnt AS x, b.cnt AS y
        |  FROM lags l
        |  JOIN s a ON TRUE
        |  JOIN s b ON b.hr = a.hr + l.lag)
        |SELECT CAST(lag AS BIGINT) AS lag, COUNT(*) AS n,
        |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |  CAST(SUM(x * x) AS BIGINT) AS sxx,
        |  CAST(SUM(y * y) AS BIGINT) AS syy,
        |  CAST(SUM(x * y) AS BIGINT) AS sxy,
        |  ROUND(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
        |    / (sqrt(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)
        |        AS DOUBLE))
        |      * sqrt(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y)
        |        AS DOUBLE))), 6) AS acf_r6
        |FROM p
        |GROUP BY lag
        |ORDER BY lag""".stripMargin,
    "dq_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100)
        |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM orders
        |), g AS (
        |  SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
        |), tot AS (SELECT SUM(n) AS total FROM g)
        |SELECT digit, n,
        |  CAST((n * 1000000) // total AS BIGINT) AS share_micro,
        |  CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |    WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |    WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |    WHEN 9 THEN 45757 END AS BIGINT) AS benford_micro,
        |  CAST((n * 1000000) // total AS BIGINT)
        |    - CAST(CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
        |      WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
        |      WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
        |      WHEN 9 THEN 45757 END AS BIGINT) AS delta_micro
        |FROM g, tot
        |ORDER BY digit""".stripMargin,
    "ev_active_users_7d" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day
        |  FROM events
        |), mx AS (SELECT MAX(day) AS mxd FROM ud),
        |w AS (
        |  SELECT ud.user_id, ud.day + r.i AS w_day
        |  FROM ud, UNNEST(range(0, 7)) AS r(i), mx
        |  WHERE ud.day + r.i <= mx.mxd)
        |SELECT CAST(w_day AS BIGINT) AS w_day,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        |FROM w
        |GROUP BY w_day
        |ORDER BY w_day""".stripMargin,
    "q61_percentile_cont" ->
      """SELECT event_type, COUNT(*) AS n,
        |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6)
        |    AS p50_r6,
        |  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6)
        |    AS p90_r6
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "text_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS tk
        |  FROM documents
        |), pos AS (
        |  SELECT doc_id, i, tk[i] AS tok
        |  FROM toks, UNNEST(range(1, len(tk) + 1)) AS r(i)
        |), bi AS (
        |  SELECT x.tok AS a, y.tok AS b, COUNT(*) AS c_ab
        |  FROM pos x JOIN pos y
        |    ON y.doc_id = x.doc_id AND y.i = x.i + 1
        |  GROUP BY x.tok, y.tok
        |), uni AS (
        |  SELECT tok, COUNT(*) AS c FROM pos GROUP BY tok
        |), nb AS (SELECT SUM(c_ab) AS n_bi FROM bi)
        |SELECT a, b, c_ab,
        |  ua.c AS c_a, ub.c AS c_b,
        |  CAST(ROUND(LN(CAST(c_ab AS DOUBLE) * CAST(n_bi AS DOUBLE)
        |    / (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS pmi_micro
        |FROM bi JOIN uni ua ON ua.tok = bi.a
        |JOIN uni ub ON ub.tok = bi.b, nb
        |WHERE c_ab >= 5
        |ORDER BY pmi_micro DESC, a, b
        |LIMIT 25""".stripMargin,
    "sim_range_search" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee
        |  GROUP BY vec_id
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |    SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id)
        |SELECT d.q_id, d.n_id,
        |  ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |FROM dots d
        |JOIN norms nq ON nq.vec_id = d.q_id
        |JOIN norms ne ON ne.vec_id = d.n_id
        |WHERE ROUND(d.dot / (nq.nrm * ne.nrm), 6) >= 0.3
        |ORDER BY q_id, n_id""".stripMargin,
    "dq_row_anomaly" ->
      """WITH d AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS cnt
        |  FROM events GROUP BY 1
        |), w AS (
        |  SELECT day, cnt,
        |    COUNT(*) OVER tw AS n_win,
        |    SUM(cnt) OVER tw AS sum_win,
        |    SUM(cnt * cnt) OVER tw AS sumsq_win
        |  FROM d
        |  WINDOW tw AS (ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT day, cnt,
        |  CAST(sum_win AS BIGINT) AS sum_win,
        |  CAST(sumsq_win AS BIGINT) AS sumsq_win,
        |  CASE WHEN sumsq_win * 7 = sum_win * sum_win THEN NULL
        |    ELSE ROUND(CAST(cnt * 7 - sum_win AS DOUBLE)
        |      / sqrt(CAST(sumsq_win * 7 - sum_win * sum_win
        |        AS DOUBLE)), 6) END AS z_r6,
        |  CASE WHEN sumsq_win * 7 = sum_win * sum_win THEN NULL
        |    ELSE ABS(ROUND(CAST(cnt * 7 - sum_win AS DOUBLE)
        |      / sqrt(CAST(sumsq_win * 7 - sum_win * sum_win
        |        AS DOUBLE)), 6)) > 3.0 END AS is_anomaly
        |FROM w WHERE n_win = 7
        |ORDER BY day""".stripMargin,
    "ts_stl_trend" ->
      """WITH s AS (
        |  SELECT (epoch_us(ts) // 3600000000) AS hr, COUNT(*) AS cnt
        |  FROM events GROUP BY 1
        |), tr AS (
        |  SELECT hr, cnt,
        |    COUNT(*) OVER (ORDER BY hr
        |      RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS n25,
        |    SUM(cnt) OVER (ORDER BY hr
        |      RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS sum25
        |  FROM s
        |), d AS (
        |  SELECT hr % 24 AS hod,
        |    cnt * 1000 - (sum25 * 1000) // 25 AS det_milli
        |  FROM tr WHERE n25 = 25)
        |SELECT CAST(hod AS BIGINT) AS hod, COUNT(*) AS n_hours,
        |  CAST(SUM(det_milli) AS BIGINT) AS sum_det_milli,
        |  ROUND(CAST(SUM(det_milli) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) / 1000.0, 6) AS seasonal_r6
        |FROM d
        |GROUP BY hod
        |ORDER BY hod""".stripMargin,
    "text_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
        |), fo AS (
        |  SELECT shingle, MIN(id) AS first_id FROM sh GROUP BY shingle)
        |SELECT sh.id AS doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN sh.id = fo.first_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST((SUM(CASE WHEN sh.id = fo.first_id THEN 1 ELSE 0 END)
        |    * 1000000) // COUNT(*) AS BIGINT) AS novelty_micro
        |FROM sh JOIN fo ON fo.shingle = sh.shingle
        |GROUP BY sh.id
        |ORDER BY doc_id""".stripMargin,
    "ev_survival_curve" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(epoch_us(ts) // 86400000000)
        |      - MIN(epoch_us(ts) // 86400000000) AS life
        |  FROM events GROUP BY user_id
        |), ks AS (SELECT UNNEST(range(0, 15)) AS k)
        |SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN life >= k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_surviving,
        |  CAST((SUM(CASE WHEN life >= k THEN 1 ELSE 0 END) * 1000000)
        |    // COUNT(*) AS BIGINT) AS surv_micro
        |FROM u, ks
        |GROUP BY k
        |ORDER BY k""".stripMargin,
    "eval_calibration" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(tk, x -> list_contains(
        |      ['the', 'a', 'of', 'and', 'in', 'to', 'is'], lower(x))))
        |      AS en_hits,
        |    len(list_filter(tk, x -> list_contains(
        |      ['el', 'la', 'de', 'que', 'y', 'en', 'es'], lower(x))))
        |      AS es_hits
        |  FROM base
        |), g AS (
        |  SELECT lang,
        |    CASE WHEN en_hits > es_hits AND en_hits > 0 THEN 'en'
        |         WHEN es_hits > en_hits AND es_hits > 0 THEN 'es'
        |         ELSE 'unk' END AS lang_guess,
        |    LEAST(ABS(en_hits - es_hits), 5) AS margin
        |  FROM m
        |)
        |SELECT CAST(margin AS BIGINT) AS margin, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  CAST((SUM(CASE WHEN lang_guess = lang THEN 1 ELSE 0 END)
        |    * 1000000) // COUNT(*) AS BIGINT) AS acc_micro
        |FROM g
        |GROUP BY margin
        |ORDER BY margin""".stripMargin,
    "q59_window_rank_fns" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_orderpriority AS prio,
        |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey % 20 = 0)
        |SELECT o_orderkey, prio, cents,
        |  ROUND(percent_rank() OVER w, 6) AS pr_r6,
        |  ROUND(cume_dist() OVER w, 6) AS cd_r6,
        |  nth_value(cents, 3) OVER (PARTITION BY prio
        |    ORDER BY cents, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS third_cents
        |FROM b
        |WINDOW w AS (PARTITION BY prio ORDER BY cents, o_orderkey)
        |ORDER BY prio, cents, o_orderkey""".stripMargin,
    "q60_asof_forward" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CAST(ROUND(value*1000) AS BIGINT) AS vm
        |  FROM events
        |), p AS (
        |  SELECT user_id, ts, MIN(event_id) AS next_seq,
        |    arg_min(vm, event_id) AS next_vm
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, p.next_seq, p.next_vm
        |FROM ev e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts <= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "text_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text),
        |    '[a-z]')) AS ch
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch
        |), q AS (
        |  SELECT doc_id, c,
        |    CAST(ROUND(ln(c) * 1e6) AS BIGINT) AS lnc_micro
        |  FROM g
        |), d AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_letters,
        |    CAST(SUM(c * lnc_micro) AS BIGINT) AS sum_clnc_micro
        |  FROM q GROUP BY doc_id)
        |SELECT doc_id, n_letters,
        |  CAST(ROUND(ln(n_letters) * 1e6) AS BIGINT)
        |    - sum_clnc_micro // n_letters AS h_micro
        |FROM d
        |ORDER BY doc_id""".stripMargin,
    "sim_mips_topk" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |    ROUND(SUM(q.x * e.x), 6) AS ip
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id, ip,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY ip DESC, n_id) AS INT) AS rank
        |  FROM dots)
        |SELECT q_id, n_id, ip, rank FROM ranked
        |WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,
  )
}
