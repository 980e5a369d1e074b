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
  * health, Application.java:40-47).
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

  // ---------------------------------------------------------------
  // sketch_hll_intersection
  // ---------------------------------------------------------------

  /** Raw-HLL constant α₂₅₆·m²·2⁴¹ for m=256 registers — the SAME
    * literal text rides in the DuckDB oracle so the double division
    * is bit-identical.
    */
  private val HllC = "1.0351398986589102e17"

  /** HLL inclusion–exclusion intersection for adjacent day pairs:
    * |A∩B| ≈ E(A) + E(B) − E(A∪B), where the union sketch is the
    * registerwise MAX (the merge law sketch_hll_merge proves) and E
    * is the raw HLL estimate α·m²/Σ2^(−Mᵢ) on the 2⁴¹-scaled integer
    * denominator. The exact intersection rides along as the audit —
    * inclusion–exclusion is the textbook way to ask a union-only
    * sketch an intersection question, and its error (can even go
    * negative) is exactly what this report surfaces.
    *
    * 100 TB shape: one (day, idx) register aggregate (≤ |days|·256
    * rows) — the corpus collapses before any pairing; day-pair joins
    * run on the bounded register/day tables.
    */
  def hllIntersection(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("hll:"), col("user_id").cast("string")))
    val du = t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id"))
      .distinct()
      .cache() // feeds registers AND the exact-intersection audit
    val regs = du
      .select(col("day"),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("idx"),
        conv(substring(h, 3, 10), 16, 10).cast("long").as("v"))
      .withColumn("rho", when(col("v") === 0, lit(41L))
        .otherwise(lit(41L) - length(bin(col("v")))))
      .groupBy("day", "idx").agg(max("rho").as("mr"))
      .cache() // read three times: est_a, est_b, union
    // raw estimate denominator: used registers contribute 2^(41-mr),
    // the (256 - used) empty ones 2^41 each
    // raw estimate + the standard small-range linear-counting switch:
    // below 2.5m (=640) with empty registers left, E = m·ln(m/zeros)
    // — without it the raw harmonic mean is biased high at low fill
    // and inclusion-exclusion error swamps small intersections
    def est(grouped: DataFrame, keyCol: String): DataFrame =
      grouped.groupBy(keyCol)
        .agg((expr("sum(shiftleft(cast(1 as bigint)," +
          " cast(41 - mr as int)))")
          + (lit(256L) - count(lit(1))) * lit(2199023255552L))
          .as("s_scaled"),
          (lit(256L) - count(lit(1))).as("zeros"))
        .withColumn("raw", expr(
          s"cast(round($HllC / cast(s_scaled as double)) as bigint)"))
        .withColumn("e", expr(
          """CASE WHEN zeros > 0 AND raw <= 640
            |THEN cast(round(256.0d * ln(256.0d
            |  / cast(zeros as double))) as bigint)
            |ELSE raw END""".stripMargin))
        .select(col(keyCol), col("e"))
    val eDay = est(regs, "day")
    val pairs = eDay.select(col("day"), col("e").as("est_a"))
      .join(eDay.select((col("day") - 1).as("day"),
        col("e").as("est_b")), "day")
    val unionRegs = regs.select(col("day"), col("idx"), col("mr"))
      .unionByName(regs.select((col("day") - 1).as("day"), col("idx"),
        col("mr")))
      .groupBy("day", "idx").agg(max("mr").as("mr"))
      // keep only days that actually pair with a successor
      .join(pairs.select("day"), "day")
    val eUnion = est(unionRegs, "day")
      .withColumnRenamed("e", "est_union")
    val exact = du.select(col("day"), col("user_id"))
      .join(du.select((col("day") - 1).as("day"), col("user_id")),
        Seq("day", "user_id"))
      .groupBy("day").agg(count(lit(1)).as("exact_inter"))
    pairs.join(eUnion, "day")
      .join(exact, Seq("day"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .withColumn("est_inter",
        col("est_a") + col("est_b") - col("est_union"))
      .select("day", "est_a", "est_b", "est_union", "est_inter",
        "exact_inter")
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // mm_audio_fingerprint
  // ---------------------------------------------------------------

  /** Constellation fingerprint over the frame-energy path (the
    * audio-dedup primitive: hash landmark PAIRS of energy peaks, then
    * match media by shared landmarks — robust to offsets the way
    * byte-equal frame matching, mm_shared_frames, is not). Peaks are
    * strict local maxima of the mm_energy_frames series above the
    * activity floor; a landmark is (peak-energy bucket, next-peak
    * bucket, frame gap ≤ 8) packed into one BIGINT key; media pairs
    * rank by DISTINCT shared landmark keys, top 25 under a total
    * order.
    *
    * 100 TB shape: per-media windows only (hash-partitioned on
    * media_id), landmark self-join bounded by the per-media peak
    * count, and the cross-media match keyed on the landmark hash with
    * an anti-hub cap (keys on ≤ 32 media) — the LSH band-join
    * discipline; no all-pairs anywhere.
    */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("frame_no")
    val peaks = Ext11Queries.energyFrameBase(spark, dir)
      .withColumn("prev_e", lag("energy", 1).over(w))
      .withColumn("next_e", lead("energy", 1).over(w))
      .filter(col("prev_e").isNotNull && col("next_e").isNotNull &&
        col("energy") > col("prev_e") &&
        col("energy") > col("next_e") &&
        col("energy") > 64L * 1500L)
      .select(col("media_id"), col("frame_no"),
        expr("energy div 20000").as("b"))
      .cache() // both sides of the landmark self-join
    val landmarks = peaks
      .select(col("media_id"), col("frame_no").as("f1"),
        col("b").as("b1"))
      .join(peaks.select(col("media_id"), col("frame_no").as("f2"),
        col("b").as("b2")), Seq("media_id"))
      .filter(col("f2") - col("f1") >= 2 && col("f2") - col("f1") <= 8)
      .select(col("media_id"),
        (col("b1") * 10000L + col("b2") * 100L +
          (col("f2") - col("f1"))).as("lk"))
      .distinct()
    // anti-hub cap: a landmark on >32 media is a stop-word, not a
    // fingerprint (and the join fan-out bound at any corpus size)
    val keyed = landmarks.join(
      landmarks.groupBy("lk").agg(count(lit(1)).as("n_media"))
        .filter(col("n_media").between(2, 32)).select("lk"), "lk")
    keyed.select(col("lk"), col("media_id").as("id_a"))
      .join(keyed.select(col("lk"), col("media_id").as("id_b")), "lk")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col("id_a"), col("id_b"))
      .limit(25)
  }

  // ---------------------------------------------------------------
  // graph_boruvka_hook
  // ---------------------------------------------------------------

  /** One Borůvka HOOK round over the simhash near-dup graph (hamming
    * = edge weight): every node picks its lexicographic-min (w,
    * neighbor) incident edge — the distributed-MST primitive, and the
    * single-linkage "best-match merge" step a dedup pipeline runs
    * before transitive collapse — then contracts one star level
    * (label = min over the picked partner's own hook). Deterministic
    * end-to-end: ties break on neighbor id.
    *
    * 100 TB shape: the pair set is the banded (pigeonhole-exact)
    * simhash candidate search — never all-pairs; the hook is one
    * keyed min-aggregate; the star contraction one self-join. A full
    * MST iterates this round O(log n) times with the ccLabels loop
    * discipline (per-round cache) — this query IS that round, oracle-
    * exact.
    */
  def boruvkaHook(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
    val sym = pairs
      .select(col("id_a").as("v"), col("id_b").as("u"),
        col("hamming").as("w"))
      .unionByName(pairs.select(col("id_b").as("v"),
        col("id_a").as("u"), col("hamming").as("w")))
    val mate = sym.groupBy("v")
      .agg(min(struct(col("w"), col("u"))).as("m"))
      .select(col("v"), col("m.u").as("mate"), col("m.w").as("w"))
      .cache() // both sides of the star-contraction self-join
    val l1 = mate.select(col("v"),
      least(col("v"), col("mate")).as("l1"), col("mate"), col("w"))
    l1.join(l1.select(col("v").as("mate"), col("l1").as("l1_mate")),
        "mate")
      .select(col("v").as("node"), col("mate"), col("w"),
        least(col("l1"), col("l1_mate")).as("star_label"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------
  // ev_user_similarity
  // ---------------------------------------------------------------

  /** Behavioral user similarity: each user's event-type count vector
    * (the 5-dim "user2vec-lite" a personalization pipeline starts
    * from), cosine-scored for 8 anchor users against the whole user
    * base over a type-keyed equi-join — dot products and squared
    * norms are exact BIGINTs; only the final cosine touches doubles
    * (identical expression text in the oracle). Top-5 matches per
    * anchor under a total order.
    *
    * 100 TB shape: one (user, type) count aggregate collapses the
    * corpus; the 40-row anchor side broadcasts; per-anchor top-k is
    * a partitioned window over |anchors|·|users| scored rows — at
    * production scale the same query routes through the ANN ladder
    * instead of exact scoring, exactly like sim_cosine_topk's note.
    */
  def userSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .cache() // anchors + corpus side + norms share it
    val norms = counts.groupBy("user_id")
      .agg(sum(col("c") * col("c")).as("n2"))
    val anchors = counts.filter(col("user_id") < 8)
      .select(col("user_id").as("q_id"), col("event_type"),
        col("c").as("qc"))
    val dots = counts.join(broadcast(anchors), "event_type")
      .filter(col("user_id") =!= col("q_id"))
      .groupBy("q_id", "user_id")
      .agg(sum(col("qc") * col("c")).as("dot"))
    val scored = dots
      .join(broadcast(norms.filter(col("user_id") < 8)
        .select(col("user_id").as("q_id"), col("n2").as("qn2"))),
        "q_id")
      .join(norms, "user_id")
      .withColumn("sim", expr(
        "round(cast(dot as double) / (sqrt(cast(qn2 as double))" +
          " * sqrt(cast(n2 as double))), 6)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("sim").desc, col("user_id"))
    scored.withColumn("rank",
        row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("user_id").as("n_id"),
        col("dot"), col("sim"))
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // dedup_cluster_medoid
  // ---------------------------------------------------------------

  /** Distance-based canonical selection: within each connected
    * component of the simhash near-dup graph, the MEDOID — the member
    * with the minimum total hamming weight over its incident near-dup
    * edges (tie: lowest id). The distance-centric complement of
    * dedup_keep_best's keep-longest heuristic: the medoid is the
    * member most representative of the cluster, which is what a
    * dedup pipeline should RETAIN when members differ by noise rather
    * than by completeness.
    *
    * 100 TB shape: edge weights aggregate per node (one keyed sum on
    * the banded pair set), CC labels come from the shared
    * large-star/small-star loop, and the medoid is one min-struct
    * aggregate per cluster — no per-cluster windows, no all-pairs.
    */
  def clusterMedoid(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
    // stored simhash component labeling (round 12): shared with
    // text_cluster_topics via NearDupGraph — see simhashCcLabels
    val labels = NearDupGraph.simhashCcLabels(spark, dir)
    val sym = pairs
      .select(col("id_a").as("id"), col("hamming").as("w"))
      .unionByName(pairs.select(col("id_b").as("id"),
        col("hamming").as("w")))
    val wsum = sym.groupBy("id")
      .agg(sum("w").as("sum_w"), count(lit(1)).as("deg"))
    labels.join(wsum, "id")
      .groupBy("cluster")
      .agg(min(struct(col("sum_w"), col("id"))).as("m"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("m.id").as("medoid_id"),
        col("m.sum_w").as("medoid_sum_w"), col("n_members"))
      .orderBy("cluster")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_regression_metrics" -> regressionMetrics _,
    "text_source_kl" -> sourceKl _,
    "dq_distribution_psi" -> distributionPsi _,
    "tok_byte_fallback" -> byteFallback _,
    "sketch_hll_intersection" -> hllIntersection _,
    "mm_audio_fingerprint" -> audioFingerprint _,
    "graph_boruvka_hook" -> boruvkaHook _,
    "ev_user_similarity" -> userSimilarity _,
    "dedup_cluster_medoid" -> clusterMedoid _,
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
    "sketch_hll_intersection" ->
      (s"""WITH du AS (
        |  SELECT DISTINCT epoch_ns(ts) // 86400000000000 AS day,
        |    user_id
        |  FROM events
        |), regs AS (
        |  SELECT day,
        |    ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
        |      1, 2))::UBIGINT AS idx,
        |    CASE WHEN ('0x' || substr(
        |        md5('hll:' || CAST(user_id AS VARCHAR)), 3, 10))
        |        ::UBIGINT = 0 THEN 41
        |      ELSE 41 - length(bin(('0x' || substr(
        |        md5('hll:' || CAST(user_id AS VARCHAR)), 3, 10))
        |        ::UBIGINT)) END AS rho
        |  FROM du
        |), day_regs AS (
        |  SELECT day, idx, CAST(MAX(rho) AS BIGINT) AS mr
        |  FROM regs GROUP BY day, idx
        |), e_day0 AS (
        |  SELECT day,
        |    CAST(round($HllC /
        |      CAST(SUM(2::BIGINT ** (41 - mr))
        |        + (256 - COUNT(*)) * 2199023255552 AS DOUBLE))
        |      AS BIGINT) AS raw,
        |    256 - COUNT(*) AS zeros
        |  FROM day_regs GROUP BY day
        |), e_day AS (
        |  SELECT day, CASE WHEN zeros > 0 AND raw <= 640
        |    THEN CAST(round(256.0 * ln(256.0
        |      / CAST(zeros AS DOUBLE))) AS BIGINT)
        |    ELSE raw END AS e
        |  FROM e_day0
        |), pairs AS (
        |  SELECT a.day, a.e AS est_a, b.e AS est_b
        |  FROM e_day a JOIN e_day b ON b.day = a.day + 1
        |), union_regs AS (
        |  SELECT u.day, u.idx, CAST(MAX(u.mr) AS BIGINT) AS mr FROM (
        |    SELECT day, idx, mr FROM day_regs
        |    UNION ALL
        |    SELECT day - 1 AS day, idx, mr FROM day_regs) u
        |  JOIN pairs p ON p.day = u.day
        |  GROUP BY u.day, u.idx
        |), e_union0 AS (
        |  SELECT day,
        |    CAST(round($HllC /
        |      CAST(SUM(2::BIGINT ** (41 - mr))
        |        + (256 - COUNT(*)) * 2199023255552 AS DOUBLE))
        |      AS BIGINT) AS raw,
        |    256 - COUNT(*) AS zeros
        |  FROM union_regs GROUP BY day
        |), e_union AS (
        |  SELECT day, CASE WHEN zeros > 0 AND raw <= 640
        |    THEN CAST(round(256.0 * ln(256.0
        |      / CAST(zeros AS DOUBLE))) AS BIGINT)
        |    ELSE raw END AS est_union
        |  FROM e_union0
        |), exact AS (
        |  SELECT a.day, CAST(COUNT(*) AS BIGINT) AS exact_inter
        |  FROM du a JOIN du b
        |    ON b.day = a.day + 1 AND b.user_id = a.user_id
        |  GROUP BY a.day)
        |SELECT p.day, p.est_a, p.est_b, u.est_union,
        |  p.est_a + p.est_b - u.est_union AS est_inter,
        |  COALESCE(x.exact_inter, 0) AS exact_inter
        |FROM pairs p
        |JOIN e_union u ON u.day = p.day
        |LEFT JOIN exact x ON x.day = p.day
        |ORDER BY p.day""").stripMargin,
    "mm_audio_fingerprint" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes
        |  FROM documents
        |), f AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest(
        |      CAST(ceil(n_bytes / 64.0) AS BIGINT), 1), 2)) AS frame_no
        |  FROM m
        |), fr AS (
        |  SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
        |    CAST(COALESCE(list_sum(list_transform(
        |      string_split(substring(text,
        |        CAST(frame_no * 64 + 1 AS BIGINT), 64), ''),
        |      ch -> CAST((ord(ch) - 32) * (ord(ch) - 32) AS BIGINT))),
        |      0) AS BIGINT) AS energy
        |  FROM f
        |), pk AS (
        |  SELECT media_id, frame_no, energy // 20000 AS b
        |  FROM (
        |    SELECT media_id, frame_no, energy,
        |      lag(energy) OVER w AS prev_e,
        |      lead(energy) OVER w AS next_e
        |    FROM fr
        |    WINDOW w AS (PARTITION BY media_id ORDER BY frame_no))
        |  WHERE prev_e IS NOT NULL AND next_e IS NOT NULL
        |    AND energy > prev_e AND energy > next_e
        |    AND energy > 64 * 1500
        |), lm AS (
        |  SELECT DISTINCT p1.media_id,
        |    p1.b * 10000 + p2.b * 100 + (p2.frame_no - p1.frame_no)
        |      AS lk
        |  FROM pk p1 JOIN pk p2 ON p2.media_id = p1.media_id
        |    AND p2.frame_no - p1.frame_no BETWEEN 2 AND 8
        |), keyed AS (
        |  SELECT l.media_id, l.lk FROM lm l
        |  JOIN (SELECT lk FROM lm GROUP BY lk
        |        HAVING COUNT(*) BETWEEN 2 AND 32) g ON g.lk = l.lk)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(COUNT(*) AS BIGINT) AS n_shared
        |FROM keyed a JOIN keyed b
        |  ON b.lk = a.lk AND a.media_id < b.media_id
        |GROUP BY a.media_id, b.media_id
        |ORDER BY n_shared DESC, id_a, id_b
        |LIMIT 25""".stripMargin,
    // banded pair search is pigeonhole-exact at maxHamming=5, so the
    // brute-force all-pairs filter is the oracle (the
    // dedup_simhash_pairs convention)
    "graph_boruvka_hook" ->
      """WITH tokrows AS (
        |  SELECT doc_id AS id,
        |    md5(unnest(string_split_regex(trim(text), '\s+'))) AS h
        |  FROM documents
        |), votes AS (
        |  SELECT id, bit,
        |    SUM(CASE WHEN
        |      ((strpos('0123456789abcdef', substr(h, bit // 4 + 1, 1)) - 1)
        |        & (1 << (3 - bit % 4))) > 0 THEN 1 ELSE -1 END) AS v
        |  FROM tokrows, UNNEST(range(0, 60)) AS b(bit)
        |  GROUP BY id, bit
        |), fps AS (
        |  SELECT id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (59 - bit)
        |        ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY id
        |), pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS w
        |  FROM fps a JOIN fps b ON a.id < b.id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 5
        |), sym AS (
        |  SELECT id_a AS v, id_b AS u, w FROM pairs
        |  UNION ALL
        |  SELECT id_b AS v, id_a AS u, w FROM pairs
        |), mate AS (
        |  SELECT v, u AS mate, w FROM (
        |    SELECT v, u, w,
        |      ROW_NUMBER() OVER (PARTITION BY v ORDER BY w, u) AS rn
        |    FROM sym) WHERE rn = 1
        |), l1 AS (
        |  SELECT v, least(v, mate) AS l1, mate, w FROM mate)
        |SELECT a.v AS node, a.mate, a.w,
        |  least(a.l1, b.l1) AS star_label
        |FROM l1 a JOIN l1 b ON b.v = a.mate
        |ORDER BY node""".stripMargin,
    "ev_user_similarity" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id, event_type
        |), norms AS (
        |  SELECT user_id, CAST(SUM(c * c) AS BIGINT) AS n2
        |  FROM counts GROUP BY user_id
        |), dots AS (
        |  SELECT q.user_id AS q_id, e.user_id,
        |    CAST(SUM(q.c * e.c) AS BIGINT) AS dot
        |  FROM counts q
        |  JOIN counts e ON e.event_type = q.event_type
        |    AND e.user_id <> q.user_id
        |  WHERE q.user_id < 8
        |  GROUP BY q.user_id, e.user_id
        |), scored AS (
        |  SELECT d.q_id, d.user_id, d.dot,
        |    round(CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(nq.n2 AS DOUBLE))
        |         * sqrt(CAST(ne.n2 AS DOUBLE))), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.user_id = d.q_id
        |  JOIN norms ne ON ne.user_id = d.user_id
        |), ranked AS (
        |  SELECT q_id, user_id, dot, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, user_id) AS rank
        |  FROM scored)
        |SELECT q_id, CAST(rank AS BIGINT) AS rank, user_id AS n_id,
        |  dot, sim
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "dedup_cluster_medoid" ->
      """WITH RECURSIVE tokrows AS (
        |  SELECT doc_id AS id,
        |    md5(unnest(string_split_regex(trim(text), '\s+'))) AS h
        |  FROM documents
        |), votes AS (
        |  SELECT id, bit,
        |    SUM(CASE WHEN
        |      ((strpos('0123456789abcdef', substr(h, bit // 4 + 1, 1)) - 1)
        |        & (1 << (3 - bit % 4))) > 0 THEN 1 ELSE -1 END) AS v
        |  FROM tokrows, UNNEST(range(0, 60)) AS b(bit)
        |  GROUP BY id, bit
        |), fps AS (
        |  SELECT id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (59 - bit)
        |        ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY id
        |), pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS w
        |  FROM fps a JOIN fps b ON a.id < b.id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 5
        |), edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs
        |), nodes AS (SELECT DISTINCT a AS id FROM edges),
        |walk(a, b) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b
        |), labels AS (
        |  SELECT a AS id, MIN(b) AS cluster FROM walk GROUP BY a
        |), wsum AS (
        |  SELECT id, CAST(SUM(w) AS BIGINT) AS sum_w FROM (
        |    SELECT id_a AS id, w FROM pairs
        |    UNION ALL SELECT id_b AS id, w FROM pairs)
        |  GROUP BY id
        |), members AS (
        |  SELECT l.cluster, l.id, s.sum_w,
        |    ROW_NUMBER() OVER (PARTITION BY l.cluster
        |      ORDER BY s.sum_w, l.id) AS rn,
        |    COUNT(*) OVER (PARTITION BY l.cluster) AS n_members
        |  FROM labels l JOIN wsum s ON s.id = l.id)
        |SELECT cluster, id AS medoid_id, sum_w AS medoid_sum_w,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM members WHERE rn = 1 ORDER BY cluster""".stripMargin,
  )
}
