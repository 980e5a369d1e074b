package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch 4: evaluation + time-series + mixing operators — the
  * measurement stages a curation pipeline runs BEFORE trusting its
  * model-driven filters (reference analog: the monitoring surface,
  * Application.java:40-47, generalized from pipeline health to model
  * health).
  *
  *  - `eval_langid_prf` / `eval_cohen_kappa`: per-class precision/
  *    recall/F1 and chance-corrected agreement for the language-ID
  *    classifier against the declared label — the go/no-go check for
  *    any model-based filter (fastText-style) before it gates data.
  *  - `eval_ann_recall`: recall@k of the SRP-LSH ANN path against the
  *    brute-force ground truth — THE standard ANN quality metric; run
  *    on a small query sample by construction (ground truth is exact
  *    top-k, which is only computable on a sample at 100 TB).
  *  - `ts_ewma`: exponentially-weighted moving average with dyadic
  *    weights (alpha = 1/2) over a bounded 8-lag window — integer-
  *    exact (value on the 1e-3 lattice, weights are powers of two, one
  *    integer division at the end), so cross-engine parity is by
  *    construction rather than FP luck.
  *  - `text_mix_temperature`: temperature-scaled source mixture
  *    weights (T = 2, i.e. w_s ∝ sqrt(p_s)) — the standard
  *    multilingual/multi-source rebalancing rule; sqrt is quantized to
  *    the 1e-6 lattice BEFORE the normalizing sum so the division is
  *    integer-exact.
  *
  * All aggregates collapse map-side to bounded tables (|classes|^2,
  * |sources|, |queries|·k); no operator here shuffles the corpus more
  * than once.
  */
object Ext11Queries {

  /** Truth/prediction marginals of the language-ID confusion matrix:
    * one row per class with row total (n_true), column total (n_pred)
    * and diagonal (tp). Bounded: |classes| rows.
    */
  private def langMarginals(spark: SparkSession, dir: String): DataFrame = {
    val cm = TextAnalysis.langId(t(spark, dir, "documents"), "text")
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
    val rowt = cm.groupBy(col("lang").as("cls")).agg(sum("n").as("rn"))
    val colt = cm.groupBy(col("lang_guess").as("cls"))
      .agg(sum("n").as("cn"))
    val diag = cm.filter(col("lang") === col("lang_guess"))
      .select(col("lang").as("cls"), col("n").as("dn"))
    rowt.join(colt, Seq("cls"), "full_outer")
      .join(diag, Seq("cls"), "left")
      .na.fill(0L, Seq("rn", "cn", "dn"))
  }

  /** Per-class precision / recall / F1 on the 1e-6 integer lattice.
    * Classes with no truth (or no prediction) mass yield NULL for the
    * undefined metric instead of a fake 0 — the honest eval contract.
    */
  def langidPrf(spark: SparkSession, dir: String): DataFrame =
    langMarginals(spark, dir)
      .select(col("cls"), col("rn").as("n_true"), col("cn").as("n_pred"),
        col("dn").as("tp"),
        when(col("cn") > 0, expr("(dn * 1000000) div cn"))
          .as("prec_micro"),
        when(col("rn") > 0, expr("(dn * 1000000) div rn"))
          .as("rec_micro"),
        when(col("rn") + col("cn") > 0,
          expr("(2 * dn * 1000000) div (rn + cn)")).as("f1_micro"))
      .orderBy("cls")

  /** Cohen's kappa = (po - pe) / (1 - pe), computed entirely in integer
    * arithmetic: with N = total, A = agreements, E = sum of
    * rowTotal*colTotal per class, kappa = (A*N - E) / (N^2 - E). Both
    * engines truncate integral division toward zero, so the lattice
    * value is engine-exact even if agreement dips below chance.
    */
  def cohenKappa(spark: SparkSession, dir: String): DataFrame =
    langMarginals(spark, dir)
      .agg(sum("rn").as("n_total"), sum("dn").as("n_agree"),
        sum(col("rn") * col("cn")).as("pe_num"))
      .select(col("n_total"), col("n_agree"),
        expr("(n_agree * 1000000) div n_total").as("po_micro"),
        expr("(pe_num * 1000000) div (n_total * n_total)")
          .as("pe_micro"),
        expr("((n_agree * n_total - pe_num) * 1000000)" +
          " div (n_total * n_total - pe_num)").as("kappa_micro"))

  /** Recall@10 of the SRP-LSH ANN path vs brute-force cosine ground
    * truth, per query vector. The ANN candidate set is bucket-pruned
    * (never all-pairs); ground truth is the broadcast brute-force pass
    * — correct HERE because the query set is 8 vectors, and that
    * sampling IS the 100 TB design (exact top-k over the full corpus
    * is only affordable for an eval sample).
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 8)
    val truth = Similarity
      .cosineTopK(emb, qs, "vec_id", "embedding", k = 10)
      .select("q_id", "n_id")
    val ann = Similarity
      .lshTopK(emb, qs, "vec_id", "embedding", k = 10, planes = 6,
        dims = 64)
      .select("q_id", "n_id")
    val tn = truth.groupBy("q_id").agg(count(lit(1)).as("n_true"))
    val an = ann.groupBy("q_id").agg(count(lit(1)).as("n_ann"))
    val hits = ann.join(truth, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    tn.join(an, Seq("q_id"), "left").join(hits, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_ann", "n_hit"))
      .withColumn("recall_micro", expr("(n_hit * 1000000) div n_true"))
      .orderBy("q_id")
  }

  /** Dyadic-weight EWMA (alpha = 1/2) over up to 8 lags per user,
    * ordered by event_id: weights 128,64,...,1 over (current..lag 7),
    * renormalized over the lags that exist. value is quantized to the
    * 1e-3 lattice first (the ev_anomaly_zscore convention), so num and
    * den are exact longs and the result is one integral division.
    * Plan: a single window pass (all 8 lags share one window spec).
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val v = t(spark, dir, "events").select(col("user_id"),
      col("event_id"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
    val lags: Seq[Column] = (1 to 7).map(j => lag(col("vm"), j).over(w))
    val num = lags.zipWithIndex.foldLeft(col("vm") * 128L) {
      case (acc, (l, i)) =>
        acc + coalesce(l, lit(0L)) * (1L << (6 - i))
    }
    val den = lags.zipWithIndex.foldLeft(lit(128L)) {
      case (acc, (l, i)) =>
        acc + when(l.isNotNull, lit(1L << (6 - i))).otherwise(lit(0L))
    }
    v.withColumn("num", num).withColumn("den", den)
      .select(col("user_id"), col("event_id"), col("vm"),
        expr("(num * 1000000) div den").as("ewma_micro"))
      .orderBy("user_id", "event_id")
  }

  /** Temperature-scaled source mixture (T = 2): w_s ∝ sqrt(n_s / N),
    * the standard rule that upweights small sources without letting
    * them dominate. sqrt values are quantized to the 1e-6 lattice
    * BEFORE the normalizing sum — the sum is then integer (order-free
    * across engines) and the final weight one integral division.
    * Whole-set windows over the |sources|-row table, no cross join.
    */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    t(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_total", sum("n_docs").over(all))
      .withColumn("p_micro", expr("(n_docs * 1000000) div n_total"))
      .withColumn("s_micro",
        round(sqrt(col("n_docs").cast("double") / col("n_total"))
          * 1e6).cast("long"))
      .withColumn("t_total", sum("s_micro").over(all))
      .withColumn("w_micro", expr("(s_micro * 1000000) div t_total"))
      .select("source", "n_docs", "p_micro", "s_micro", "w_micro")
      .orderBy("source")
  }

  /** Perceptual-hash dedup over the binary media path — the image-
    * dedup operator of a multimodal corpus. The 60-bit aHash comes
    * from the partition-batched decode stub (byte histogram): bit b
    * set iff histogram bucket b exceeds the mean, compared on
    * recovered EXACT integer counts (60*cnt > n) so the fingerprint is
    * engine-portable. Output is perceptual-exact GROUPS (fingerprint,
    * member count, kept representative) rather than pairs: grouping is
    * one hash-partitioned groupBy on the fingerprint — the LAION-style
    * production shape — and output stays bounded by group count where
    * a pair listing would grow quadratically inside hot fingerprints
    * (this corpus: 28% of all pairs within hamming 3, which is the
    * measured reason pairs are the wrong contract).
    */
  def mmPhashDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(spark, media, featureDim = 60)
    val lens = docs.select(col("doc_id").as("media_id"),
      octet_length(col("text")).cast("long").as("n"))
    feats.join(lens, "media_id")
      .select(col("media_id").as("id"),
        expr("aggregate(sequence(0, 59), 0L, (acc, b) -> acc + " +
          "IF(60 * cast(round(element_at(feature, b + 1) * n) as bigint)" +
          " > n, shiftleft(1L, b), 0L))").as("phash"))
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_media"), min(col("id")).as("keep_id"))
      .filter(col("n_media") > 1)
      .orderBy("phash")
  }

  /** MinHash calibration: per band-collision candidate pair, the
    * 16-seed signature estimate of Jaccard next to the exact value and
    * the absolute error — the measurement that justifies (or vetoes)
    * replacing exact verification with signature agreement at scale.
    * No min-J filter and no size prune: calibration wants the low-J
    * collisions too. Candidates stay bucket-collision-bounded.
    */
  def minhashErr(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
    val szOf = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    // cache(): the signature table feeds THREE subtrees (band
    // explode, probe-side A, probe-side B) — without it the 16-wide
    // min-aggregate over every shingle runs three times. Plan-keyed
    // (CacheManager canonicalization), so repeated constructions
    // share one entry and the bench's clearCache releases it.
    val sig = Dedup.minhashSignatures(sh, 16).cache()
    val bandSig = sig.select(col("id"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            concat_ws(",", (0 until 4).map(r =>
              col(s"mh${b * 4 + r}")): _*).as("bsig"))
        }: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"),
        col("bs.bsig").as("bsig"))
    val cands = bandSig.as("a").join(bandSig.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bsig") === col("b.bsig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    val sigA = sig.select(col("id").as("id_a") +:
      (0 until 16).map(i => col(s"mh$i").as(s"a_mh$i")): _*)
    val sigB = sig.select(col("id").as("id_b") +:
      (0 until 16).map(i => col(s"mh$i").as(s"b_mh$i")): _*)
    val est = cands.join(sigA, "id_a").join(sigB, "id_b")
      .withColumn("n_agree", (0 until 16).map(i =>
        when(col(s"a_mh$i") === col(s"b_mh$i"), 1L).otherwise(0L))
        .reduce(_ + _))
      .select("id_a", "id_b", "n_agree")
    val common = cands
      .join(sh.select(col("id").as("id_a"), col("shingle").as("s")),
        Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle").as("s")),
        Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    est.join(common, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("common"))
      .join(szOf.select(col("id").as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(szOf.select(col("id").as("id_b"), col("sz").as("sz_b")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("n_agree"),
        expr("(n_agree * 1000000) div 16").as("est_micro"),
        expr("(common * 1000000) div (sz_a + sz_b - common)")
          .as("j_micro"))
      .withColumn("err_micro",
        abs(col("est_micro") - col("j_micro")))
      .orderBy("id_a", "id_b")
  }

  /** Event-time freshness audit per event type: last event timestamp,
    * lag behind the corpus watermark, and a staleness verdict — the
    * data-quality gate that catches a silently-dead upstream feed.
    * One map-side-collapsing aggregate + a whole-set window over the
    * |event_types|-row table.
    */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    t(spark, dir, "events")
      .select(col("event_type"), expr("ts div 1000").as("us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), max("us").as("last_us"))
      .withColumn("corpus_last_us", max("last_us").over(all))
      .withColumn("lag_us", col("corpus_last_us") - col("last_us"))
      .withColumn("freshness",
        when(col("lag_us") < 3600L * 1000000L, "fresh")
          .when(col("lag_us") < 24L * 3600L * 1000000L, "lagging")
          .otherwise("stale"))
      .select("event_type", "n_events", "last_us", "lag_us", "freshness")
      .orderBy("event_type")
  }

  /** Linear-interpolation resampling onto an hourly grid — the other
    * half of q36's forward-fill: gaps get the straight line between
    * the surrounding observations. Anchors and the grid live on
    * integer hour indices and the 1e-3 value lattice, so the lerp is
    * one integral division (truncation identical across engines, even
    * for downward slopes). Two complementary running windows (last
    * preceding / first following anchor) — no self-join against the
    * observation table.
    */
  def resampleLinear(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("user_id") % 10 === 1)
      .select(col("user_id"),
        date_trunc("hour", graft.Tables.eventsTsMicros).as("hr"),
        round(col("value") * 1000).cast("long").as("vm"))
    val hourly = ev.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n"), max(col("vm")).as("vm_hr"))
    val grid = ev.groupBy("user_id")
      .agg(min(col("hr")).as("hr0"), max(col("hr")).as("hr1"))
      .select(col("user_id"), explode(sequence(col("hr0"), col("hr1"),
        expr("interval 1 hour"))).as("hr"))
    val wPrev = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(0, Window.unboundedFollowing)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("hi", expr("unix_micros(hr) div 3600000000"))
      .withColumn("v_p", last(col("vm_hr"), ignoreNulls = true).over(wPrev))
      .withColumn("h_p", last(when(col("vm_hr").isNotNull, col("hi")),
        ignoreNulls = true).over(wPrev))
      .withColumn("v_n", first(col("vm_hr"), ignoreNulls = true).over(wNext))
      .withColumn("h_n", first(when(col("vm_hr").isNotNull, col("hi")),
        ignoreNulls = true).over(wNext))
      .withColumn("vm_lerp", when(col("h_n") === col("h_p"), col("v_p"))
        .otherwise(expr(
          "v_p + ((v_n - v_p) * (hi - h_p)) div (h_n - h_p)")))
      .select("user_id", "hr", "n", "vm_lerp")
      .orderBy("user_id", "hr")
  }

  /** Reciprocal-rank fusion of the sparse (BM25 top-20) and dense
    * (cosine top-20 for query vector 0) rankings — the standard hybrid
    * retrieval combiner: rrf(d) = sum over lists of 1/(60 + rank_d),
    * here on the 1e-6 integer lattice. Both inputs are already bounded
    * top-k lists, so the fusion itself is a 40-row full-outer join; at
    * 100 TB the cost lives in the two retrieval legs, which keep their
    * own scale shapes (inverted stats / bucket-pruned ANN).
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val sparse = Ext6Queries.bm25TopK(spark, dir)
      .select(col("doc_id"), col("rank").cast("long").as("rank_bm25"))
    val emb = t(spark, dir, "embeddings")
    val dense = Similarity
      .cosineTopK(emb, emb.filter(col("vec_id") === 0), "vec_id",
        "embedding", k = 20)
      .select(col("n_id").as("doc_id"), col("rank").cast("long")
        .as("rank_cos"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + rank_bm25)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_cos)"), lit(0L)))
      // bounded domain: full-outer of two top-20 lists ≤ 40 rows
      .withColumn("rrf_rank", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("doc_id")))
        .cast("long"))
      .select("rrf_rank", "doc_id", "rank_bm25", "rank_cos",
        "rrf_micro")
      .orderBy("rrf_rank")
  }

  /** Hilbert-curve layout audit — the locality-preserving alternative
    * to layout_zorder (same audit contract: bucket by the high bits of
    * the space-filling index, report per-bucket bounding boxes in both
    * dimensions = the parquet min/max stats a writer would record).
    * The Hilbert walk never jumps between consecutive indices, so
    * buckets tile the (custkey, day) plane in connected regions where
    * z-order buckets straddle bit-boundary seams; lakehouse writers
    * offer both orders for exactly this trade. Index = the codegen'd
    * `hilbert` expression; the oracle replays the 16-round quadrant
    * fold as a recursive CTE.
    */
  def hilbertLayout(spark: SparkSession, dir: String): DataFrame = {
    val day = "datediff(o_orderdate, date'1992-01-01')"
    t(spark, dir, "orders")
      .withColumn("h", graft.functions.GraftFunctions.hilbert(
        expr("o_custkey & 65535"), expr(s"($day) & 65535")))
      .withColumn("hbucket", expr("shiftright(h, 16)"))
      .groupBy(col("hbucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_custkey")).as("cust_min"),
        max(col("o_custkey")).as("cust_max"),
        min(expr(day)).cast("long").as("day_min"),
        max(expr(day)).cast("long").as("day_max"))
      .orderBy("hbucket")
  }

  /** Matryoshka truncation fidelity: overlap@10 between the full
    * 64-dim cosine ranking and the ranking over the first 16
    * dimensions only — the measurement behind serving truncated
    * (matryoshka) embeddings at a fraction of the storage/compute.
    * Cosine normalizes per-vector, so no renorm step is needed for
    * rank order; both legs share the brute-force-on-a-sample contract
    * of eval_ann_recall.
    */
  def matryoshkaOverlap(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 8)
    val full = Similarity
      .cosineTopK(emb, qs, "vec_id", "embedding", k = 10)
      .select("q_id", "n_id")
    val embT = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 16).as("embedding"))
    val trunc = Similarity
      .cosineTopK(embT, embT.filter(col("vec_id") < 8), "vec_id",
        "embedding", k = 10)
      .select("q_id", "n_id")
    val fn = full.groupBy("q_id").agg(count(lit(1)).as("n_full"))
    val tn = trunc.groupBy("q_id").agg(count(lit(1)).as("n_trunc"))
    val ov = full.join(trunc, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_overlap"))
    fn.join(tn, Seq("q_id"), "left").join(ov, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_trunc", "n_overlap"))
      .withColumn("overlap_micro",
        expr("(n_overlap * 1000000) div n_full"))
      .orderBy("q_id")
  }

  /** Vocabulary coverage@K — the tokenizer-design curve: what share
    * of all token OCCURRENCES do the top-K token TYPES cover? The
    * number that decides vocab size (and the OOV rate a fixed vocab
    * pays). Shape: one (token)-keyed count shuffle collapses the
    * corpus to the type table; sort-limit takes the top-1000 types
    * (TakeOrderedAndProject — ranking the WHOLE vocab in a global
    * window was the r7-verdict-ask-#4 single-partition shape), the
    * rank window runs on those 1000 survivors only, and the
    * denominator rides a 1-row broadcast. Coverage sums are exact
    * integers.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val freq = t(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .cache() // read twice: top-k survivors + 1-row total
    val ranked = freq
      .orderBy(col("cnt").desc, col("tok")).limit(1000)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))))
    val tot = broadcast(freq.agg(sum("cnt").as("total_occ")))
    Seq(100, 1000).map { k =>
      ranked.filter(col("rk") <= k)
        .crossJoin(tot)
        .groupBy()
        .agg(lit(k.toLong).as("k"),
          count(lit(1)).as("n_types"),
          sum("cnt").as("covered_occ"),
          max("total_occ").as("total_occ"))
    }.reduce(_ unionAll _)
      .withColumn("coverage_micro",
        expr("(covered_occ * 1000000) div total_occ"))
      .orderBy("k")
  }

  /** Gaps-and-islands: per customer, the longest streak of
    * consecutive orders (by order date) with strictly rising total
    * price. The classic islands trick — a running count of streak
    * RESETS labels each island, island sizes fall out of one keyed
    * aggregate. All windows are per-customer (hash-partitioned);
    * nothing global.
    */
  def risingStreaks(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    val flagged = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
      .withColumn("rise",
        when(col("o_totalprice") > lag(col("o_totalprice"), 1).over(w),
          1L).otherwise(0L))
      .withColumn("island", sum(lit(1L) - col("rise")).over(wRun))
    flagged.groupBy("o_custkey", "island")
      .agg(count(lit(1)).as("island_len"))
      .groupBy("o_custkey")
      .agg(sum("island_len").as("n_orders"),
        (max("island_len") - 1L).as("longest_rising_run"))
      .orderBy("o_custkey")
  }

  /** RFM segmentation — the classic customer-analytics scoring: per
    * user, Recency (last event time), Frequency (event count) and
    * Monetary (value sum on the 1e-3 lattice), each bucketed into
    * quintiles by NTILE semantics over a TOTAL order (metric, then
    * user_id) so bucket edges are engine-exact.
    *
    * Round-8 scale fix (r7 verdict ask #4): the three quintiles were
    * global `ntile(5) OVER (ORDER BY ...)` windows — every user row
    * through ONE task. Each is now DistRank.globalRowNumber (range
    * shuffle + partition-local rank + broadcast offsets — fully
    * parallel) fed into the exact NTILE bucket formula with the
    * 1-row user count broadcast back. Bit-identical to ntile(5) by
    * construction (DistRankSpec proves it on this exact query shape);
    * the DuckDB oracle keeps plain NTILE.
    */
  def rfmScores(spark: SparkSession, dir: String): DataFrame = {
    val perUser = t(spark, dir, "events")
      .select(col("user_id"), expr("ts div 1000").as("us"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("n_events"),
        sum("vm").as("sum_vm"))
    val nUsers = perUser.agg(count(lit(1)).as("_n_users"))
    def quintile(df: DataFrame, score: String, order: Column*)
        : DataFrame = {
      val ranked = DistRank.globalRowNumber(df, "_rn", 32, order: _*)
      ranked.crossJoin(broadcast(nUsers))
        .withColumn(score,
          DistRank.ntileFromRowNumber(col("_rn"), col("_n_users"), 5)
            .cast("long"))
        .drop("_rn", "_n_users")
    }
    var scored = perUser
    scored = quintile(scored, "r_score",
      col("last_us").desc, col("user_id"))
    scored = quintile(scored, "f_score",
      col("n_events").desc, col("user_id"))
    scored = quintile(scored, "m_score",
      col("sum_vm").desc, col("user_id"))
    scored
      .withColumn("segment", concat(col("r_score"), col("f_score"),
        col("m_score")))
      .select("user_id", "last_us", "n_events", "sum_vm", "r_score",
        "f_score", "m_score", "segment")
      .orderBy("user_id")
  }

  /** Neighbor-set Jaccard between suppliers over the bipartite
    * customer-supplier order graph — the link-prediction /
    * collaborative-filtering similarity. Candidates come from wedge
    * joins (pairs sharing >= 1 customer), never all-pairs, with the
    * customer-set sizes carried into one exact integer division; the
    * output contract is the top-50 most-similar pairs under a total
    * order (a fixed J threshold is data-dependent — measured: every
    * qualifying pair at sf0.001 vanishes at sf0.01), planned as
    * TakeOrderedAndProject, never a global sort.
    *
    * Hub cut (round-7 verdict ask #2): customers whose supplier set
    * exceeds maxCustDeg=72 are pruned from the WEDGE sides only (the
    * Jaccard denominators `sz` stay full-edge-set exact), bounding
    * per-customer pair fan-out at C(72,2) — without it the wedge is
    * Σ deg² and one hub customer at production scale degenerates the
    * whole query quadratic. 72 is inert at every oracle SF (measured
    * max customer degree: 10 at sf0.001, 67 at sf0.01 — guarded by
    * Ext11QueriesSpec) and nearly inert on the synthetic distribution
    * at any SF: degrees are UNIFORM (~40 mean, max 102 at both sf0.1
    * and sf1; Σ deg² grows exactly 10x from sf0.1 to sf1), so the
    * measured sf1 growth is already near-linear and the cap's value
    * is the worst-case bound under real-world skew, exactly like
    * graph_link_predict's maxDeg=64 (Ext14Queries).
    */
  def jaccardNeighbors(spark: SparkSession, dir: String): DataFrame = {
    // cache(), revisited in round 12: the earlier "ReuseExchange
    // shares the subtree" claim no longer holds — the formatted plan
    // (plans/r12/graph_jaccard_neighbors_before.txt) shows 12 parquet
    // scans / 15 exchanges with zero ReusedExchange nodes (the sizes,
    // hub-cut and both wedge sides each re-run the orders⋈lineitem ⋈
    // distinct chain under differently-aliased parents). One cached
    // copy of the narrow (cust, supp) edge list is the lightweight
    // proxy table of guide §2.4/§8. sf0.1 warm time is dominated by
    // the ~12M-row wedge aggregate itself (unchanged, it IS the
    // query's work), but the plan drops 10 scans and 2 wedge-side
    // exchanges — the part that would not have scaled.
    val edges = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct().cache()
    val sz = edges.groupBy(col("supp")).agg(count(lit(1)).as("sz"))
    // Wedge enumeration WITHOUT the self-join (round 12, guide §2.4):
    // the old l⋈r shape shuffled the edge list twice more (both join
    // sides exchange on cust, then sort for the merge) to produce
    // exactly the pairs a per-customer sorted neighbor array yields
    // in-stage. One groupBy(cust) shuffle builds the arrays; the ≤72
    // hub cut is now a size(ns) filter ON the arrays (cdeg ==
    // size(ns) by construction — edges are distinct), subsuming the
    // old degree aggregate + broadcast join outright. Two codegen'd
    // explodes enumerate the ordered pairs (suppliers are distinct
    // per customer and the array sorts ascending, so a-before-rest
    // == id_a < id_b), and the pair aggregate partial-combines
    // map-side before its single exchange — one wedge exchange
    // instead of three, no join. Jaccard denominators `sz` stay
    // full-edge-set exact, computed from the cached edge list.
    val nbrs = edges.groupBy("cust")
      .agg(sort_array(collect_list(col("supp"))).as("ns"))
      .filter(size(col("ns")) <= 72)
    val common = nbrs
      .select(posexplode(col("ns")).as(Seq("i", "id_a")), col("ns"))
      .select(col("id_a"),
        explode(slice(col("ns"), col("i") + lit(2),
          greatest(size(col("ns")) - col("i") - 1, lit(0))))
          .as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sz.select(col("supp").as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(sz.select(col("supp").as("id_b"), col("sz").as("sz_b")),
        "id_b")
      .withColumn("j_micro",
        expr("(common * 1000000) div (sz_a + sz_b - common)"))
      .select("id_a", "id_b", "common", "j_micro")
      .orderBy(col("j_micro").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** Audio-style frame energy over the binary media path: per sampled
    * frame, the integer energy sum((code - 32)^2) and an activity
    * flag — the silence-trim primitive (what VAD does to audio before
    * a training pipeline keeps the voiced spans). Rides the same
    * partition-batched frame slicing as mm_frames; energy is exact
    * integers end-to-end.
    */
  def energyFrames(spark: SparkSession, dir: String): DataFrame =
    energyFrameBase(spark, dir).orderBy("media_id", "frame_no")

  /** The unordered (media_id, frame_no, energy, active) table every
    * downstream mm_* consumer windows/aggregates over — split out in
    * round 12 so consumers stop paying `energyFrames`' presentation
    * orderBy (their windows/aggregates don't need it), and cached
    * plan-keyed so a query composing several energy consumers
    * (mm_span_iou = shot boundaries ⋈ VAD spans) decodes the media
    * payload ONCE instead of once per leg (guide §8: decode once,
    * decide on the small table). ~16 narrow rows per document; the
    * harness' between-query clearCache releases it.
    */
  private[operators] def energyFrameBase(spark: SparkSession,
      dir: String): DataFrame = {
    val media = Multimodal.attachMedia(
      t(spark, dir, "documents"), "doc_id", "text")
    Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .select(col("media_id"), col("frame_no").cast("long")
        .as("frame_no"),
        col("frame").cast("string").as("fs"))
      // per-char fold over the bounded 64-byte frame; sequence(1, 0)
      // would run DOWNWARD in Spark, so the empty frame is guarded
      .withColumn("energy", expr(
        "IF(char_length(fs) = 0, 0L, aggregate(" +
          "transform(sequence(1, char_length(fs)), " +
          "i -> (ascii(substring(fs, i, 1)) - 32) " +
          "* (ascii(substring(fs, i, 1)) - 32)), 0L, " +
          "(acc, x) -> acc + cast(x as bigint)))"))
      .select(col("media_id"), col("frame_no"), col("energy"))
      .withColumn("active", col("energy") > 64L * 1500L)
      .cache()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_rfm_scores" -> rfmScores _,
    "graph_jaccard_neighbors" -> jaccardNeighbors _,
    "mm_energy_frames" -> energyFrames _,
    "text_vocab_coverage" -> vocabCoverage _,
    "q57_streaks" -> risingStreaks _,
    "eval_matryoshka_overlap" -> matryoshkaOverlap _,
    "layout_hilbert" -> hilbertLayout _,
    "eval_langid_prf" -> langidPrf _,
    "eval_cohen_kappa" -> cohenKappa _,
    "eval_ann_recall" -> annRecall _,
    "ts_ewma" -> ewma _,
    "text_mix_temperature" -> mixTemperature _,
    "mm_phash_dups" -> mmPhashDups _,
    "eval_minhash_err" -> minhashErr _,
    "dq_freshness" -> freshness _,
    "ts_resample_linear" -> resampleLinear _,
    "text_rrf_fusion" -> rrfFusion _,
  )

  /** Shared confusion-matrix marginal CTE prefix (mirrors
    * text_lang_confusion's tokenization exactly).
    */
  private val marginalsCte: String =
    """WITH base AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tk
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
      |         ELSE 'unk' END AS lang_guess
      |  FROM m
      |), cm AS (
      |  SELECT lang, lang_guess, COUNT(*) AS n FROM g
      |  GROUP BY lang, lang_guess
      |), rt AS (
      |  SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS rn FROM cm
      |  GROUP BY lang
      |), ct AS (
      |  SELECT lang_guess AS cls, CAST(SUM(n) AS BIGINT) AS cn FROM cm
      |  GROUP BY lang_guess
      |), dg AS (
      |  SELECT lang AS cls, CAST(n AS BIGINT) AS dn FROM cm
      |  WHERE lang = lang_guess
      |), j AS (
      |  SELECT COALESCE(rt.cls, ct.cls) AS cls, COALESCE(rn, 0) AS rn,
      |    COALESCE(cn, 0) AS cn, COALESCE(dn, 0) AS dn
      |  FROM rt FULL OUTER JOIN ct ON ct.cls = rt.cls
      |  LEFT JOIN dg ON dg.cls = COALESCE(rt.cls, ct.cls))
      |""".stripMargin

  /** Shared embedding CTE prefix for the recall oracle: brute-force
    * truth and LSH candidates over the same rounded-sim lattice
    * (mirrors the sim_cosine_topk / sim_ann_lsh oracles at k = 10).
    */
  private val annRecallSql: String =
    """WITH ee AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
      |), dots AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
      |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
      |  WHERE q.vec_id < 8
      |  GROUP BY q.vec_id, e.vec_id
      |), sims AS (
      |  SELECT d.q_id, d.n_id,
      |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
      |  FROM dots d
      |  JOIN norms nq ON nq.vec_id = d.q_id
      |  JOIN norms ne ON ne.vec_id = d.n_id
      |), truth AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY sim DESC, n_id) AS rank
      |    FROM sims) WHERE rank <= 10
      |), contrib AS (
      |  SELECT vec_id, p,
      |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
      |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
      |      AS c
      |  FROM ee, UNNEST(range(0, 6)) AS pl(p)
      |  GROUP BY vec_id, p
      |), buckets AS (
      |  SELECT vec_id,
      |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
      |      ORDER BY p) AS bucket
      |  FROM contrib GROUP BY vec_id
      |), ann AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT s.q_id, s.n_id, ROW_NUMBER() OVER (PARTITION BY s.q_id
      |      ORDER BY s.sim DESC, s.n_id) AS rank
      |    FROM sims s
      |    JOIN buckets bq ON bq.vec_id = s.q_id
      |    JOIN buckets be ON be.vec_id = s.n_id
      |      AND be.bucket = bq.bucket) WHERE rank <= 10
      |), tn AS (
      |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_true FROM truth
      |  GROUP BY q_id
      |), an AS (
      |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_ann FROM ann
      |  GROUP BY q_id
      |), h AS (
      |  SELECT a.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      |  FROM ann a JOIN truth t ON t.q_id = a.q_id AND t.n_id = a.n_id
      |  GROUP BY a.q_id)
      |SELECT tn.q_id, tn.n_true, COALESCE(an.n_ann, 0) AS n_ann,
      |  COALESCE(h.n_hit, 0) AS n_hit,
      |  CAST((COALESCE(h.n_hit, 0) * 1000000) // tn.n_true AS BIGINT)
      |    AS recall_micro
      |FROM tn
      |LEFT JOIN an ON an.q_id = tn.q_id
      |LEFT JOIN h ON h.q_id = tn.q_id
      |ORDER BY tn.q_id""".stripMargin

  val oracle: Map[String, String] = Map(
    // the 16-round xy2d quadrant fold replayed as a recursive CTE over
    // the DISTINCT (x, y) points; d accumulates s^2 * (3*rx XOR ry),
    // then reflect-and-swap rotates the frame for the next round
    "layout_hilbert" ->
      """WITH RECURSIVE pts AS (
        |  SELECT o_custkey,
        |    date_diff('day', DATE '1992-01-01', o_orderdate) AS day
        |  FROM orders
        |), dpts AS (
        |  SELECT DISTINCT CAST(o_custkey & 65535 AS BIGINT) AS x0,
        |    CAST(day & 65535 AS BIGINT) AS y0
        |  FROM pts
        |), hil AS (
        |  SELECT x0, y0, x0 AS x, y0 AS y,
        |    CAST(32768 AS BIGINT) AS s, CAST(0 AS BIGINT) AS d
        |  FROM dpts
        |  UNION ALL
        |  SELECT x0, y0,
        |    CASE WHEN ry = 0 THEN
        |      (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END)
        |    ELSE x END AS x,
        |    CASE WHEN ry = 0 THEN
        |      (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END)
        |    ELSE y END AS y,
        |    s // 2 AS s,
        |    d + s * s * xor(3 * rx, ry) AS d
        |  FROM (
        |    SELECT x0, y0, x, y, s, d,
        |      CASE WHEN (x & s) > 0 THEN 1 ELSE 0 END AS rx,
        |      CASE WHEN (y & s) > 0 THEN 1 ELSE 0 END AS ry
        |    FROM hil WHERE s > 0)
        |), hd AS (
        |  SELECT x0, y0, d FROM hil WHERE s = 0)
        |SELECT hd.d >> 16 AS hbucket, CAST(COUNT(*) AS BIGINT)
        |    AS n_orders,
        |  MIN(p.o_custkey) AS cust_min, MAX(p.o_custkey) AS cust_max,
        |  CAST(MIN(p.day) AS BIGINT) AS day_min,
        |  CAST(MAX(p.day) AS BIGINT) AS day_max
        |FROM pts p
        |JOIN hd ON hd.x0 = (p.o_custkey & 65535)
        |  AND hd.y0 = (p.day & 65535)
        |GROUP BY hbucket
        |ORDER BY hbucket""".stripMargin,
    "eval_langid_prf" -> (marginalsCte +
      """SELECT cls, rn AS n_true, cn AS n_pred, dn AS tp,
        |  CASE WHEN cn > 0 THEN (dn * 1000000) // cn END AS prec_micro,
        |  CASE WHEN rn > 0 THEN (dn * 1000000) // rn END AS rec_micro,
        |  CASE WHEN rn + cn > 0 THEN (2 * dn * 1000000) // (rn + cn)
        |    END AS f1_micro
        |FROM j ORDER BY cls""".stripMargin),
    "eval_cohen_kappa" -> (marginalsCte +
      """, s AS (
        |  SELECT CAST(SUM(rn) AS BIGINT) AS n_total,
        |    CAST(SUM(dn) AS BIGINT) AS n_agree,
        |    CAST(SUM(rn * cn) AS BIGINT) AS pe_num
        |  FROM j)
        |SELECT n_total, n_agree,
        |  (n_agree * 1000000) // n_total AS po_micro,
        |  (pe_num * 1000000) // (n_total * n_total) AS pe_micro,
        |  ((n_agree * n_total - pe_num) * 1000000)
        |    // (n_total * n_total - pe_num) AS kappa_micro
        |FROM s""".stripMargin),
    "eval_ann_recall" -> annRecallSql,
    "ev_rfm_scores" ->
      """WITH u AS (
        |  SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS sum_vm
        |  FROM events GROUP BY user_id)
        |SELECT user_id, last_us, n_events, sum_vm,
        |  CAST(NTILE(5) OVER (ORDER BY last_us DESC, user_id)
        |    AS BIGINT) AS r_score,
        |  CAST(NTILE(5) OVER (ORDER BY n_events DESC, user_id)
        |    AS BIGINT) AS f_score,
        |  CAST(NTILE(5) OVER (ORDER BY sum_vm DESC, user_id)
        |    AS BIGINT) AS m_score,
        |  CAST(NTILE(5) OVER (ORDER BY last_us DESC, user_id)
        |      AS VARCHAR)
        |    || CAST(NTILE(5) OVER (ORDER BY n_events DESC, user_id)
        |      AS VARCHAR)
        |    || CAST(NTILE(5) OVER (ORDER BY sum_vm DESC, user_id)
        |      AS VARCHAR) AS segment
        |FROM u ORDER BY user_id""".stripMargin,
    "graph_jaccard_neighbors" ->
      """WITH edges AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), sz AS (
        |  SELECT supp, CAST(COUNT(*) AS BIGINT) AS sz FROM edges
        |  GROUP BY supp
        |), kept AS (
        |  -- mirrors the Spark plan's maxCustDeg=72 wedge hub cut so
        |  -- the parity gate tests identical semantics (round-8
        |  -- ADVICE); denominators sz stay full-edge-set exact
        |  SELECT cust FROM edges GROUP BY cust HAVING COUNT(*) <= 72
        |), wedge AS (
        |  SELECT e.cust, e.supp FROM edges e
        |  JOIN kept k ON k.cust = e.cust
        |), common AS (
        |  SELECT a.supp AS id_a, b.supp AS id_b,
        |    CAST(COUNT(*) AS BIGINT) AS common
        |  FROM wedge a JOIN wedge b
        |    ON b.cust = a.cust AND a.supp < b.supp
        |  GROUP BY a.supp, b.supp)
        |SELECT c.id_a, c.id_b, c.common,
        |  CAST((c.common * 1000000) // (sa.sz + sb.sz - c.common)
        |    AS BIGINT) AS j_micro
        |FROM common c
        |JOIN sz sa ON sa.supp = c.id_a
        |JOIN sz sb ON sb.supp = c.id_b
        |ORDER BY j_micro DESC, c.id_a, c.id_b
        |LIMIT 50""".stripMargin,
    "mm_energy_frames" ->
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
        |    substring(text, CAST(frame_no * 64 + 1 AS BIGINT), 64)
        |      AS fs
        |  FROM f)
        |SELECT media_id, frame_no,
        |  CAST(COALESCE(list_sum(list_transform(
        |    string_split(fs, ''),
        |    ch -> CAST((ord(ch) - 32) * (ord(ch) - 32) AS BIGINT))), 0)
        |    AS BIGINT) AS energy,
        |  COALESCE(list_sum(list_transform(string_split(fs, ''),
        |    ch -> CAST((ord(ch) - 32) * (ord(ch) - 32) AS BIGINT))), 0)
        |    > 64 * 1500 AS active
        |FROM fr ORDER BY media_id, frame_no""".stripMargin,
    "text_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT lower(unnest(string_split_regex(trim(text), '\s+')))
        |    AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk
        |  GROUP BY tok
        |), ranked AS (
        |  SELECT tok, cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk,
        |    CAST(SUM(cnt) OVER () AS BIGINT) AS total_occ
        |  FROM freq
        |), ks AS (SELECT UNNEST([100, 1000]) AS k)
        |SELECT CAST(ks.k AS BIGINT) AS k,
        |  CAST(COUNT(*) AS BIGINT) AS n_types,
        |  CAST(SUM(r.cnt) AS BIGINT) AS covered_occ,
        |  MAX(r.total_occ) AS total_occ,
        |  CAST((SUM(r.cnt) * 1000000) // MAX(r.total_occ) AS BIGINT)
        |    AS coverage_micro
        |FROM ks JOIN ranked r ON r.rk <= ks.k
        |GROUP BY ks.k ORDER BY k""".stripMargin,
    "q57_streaks" ->
      """WITH flagged AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    CASE WHEN o_totalprice > lag(o_totalprice, 1) OVER w
        |      THEN 1 ELSE 0 END AS rise
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey)
        |), isl AS (
        |  SELECT o_custkey,
        |    SUM(1 - rise) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS island
        |  FROM flagged
        |), sizes AS (
        |  SELECT o_custkey, island, CAST(COUNT(*) AS BIGINT)
        |    AS island_len
        |  FROM isl GROUP BY o_custkey, island)
        |SELECT o_custkey, CAST(SUM(island_len) AS BIGINT) AS n_orders,
        |  CAST(MAX(island_len) - 1 AS BIGINT) AS longest_rising_run
        |FROM sizes GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "eval_matryoshka_overlap" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), fnorms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), fdots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), full_top AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT d.q_id, d.n_id, ROW_NUMBER() OVER (
        |      PARTITION BY d.q_id ORDER BY
        |        ROUND(d.dot / (nq.nrm * ne.nrm), 6) DESC, d.n_id) AS rank
        |    FROM fdots d
        |    JOIN fnorms nq ON nq.vec_id = d.q_id
        |    JOIN fnorms ne ON ne.vec_id = d.n_id) WHERE rank <= 10
        |), te AS (
        |  SELECT vec_id, i, x FROM ee WHERE i <= 16
        |), tnorms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM te GROUP BY vec_id
        |), tdots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM te q JOIN te e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), trunc_top AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT d.q_id, d.n_id, ROW_NUMBER() OVER (
        |      PARTITION BY d.q_id ORDER BY
        |        ROUND(d.dot / (nq.nrm * ne.nrm), 6) DESC, d.n_id) AS rank
        |    FROM tdots d
        |    JOIN tnorms nq ON nq.vec_id = d.q_id
        |    JOIN tnorms ne ON ne.vec_id = d.n_id) WHERE rank <= 10
        |), fn AS (
        |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_full FROM full_top
        |  GROUP BY q_id
        |), tn AS (
        |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_trunc FROM trunc_top
        |  GROUP BY q_id
        |), ov AS (
        |  SELECT f.q_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        |  FROM full_top f JOIN trunc_top t2
        |    ON t2.q_id = f.q_id AND t2.n_id = f.n_id
        |  GROUP BY f.q_id)
        |SELECT fn.q_id, fn.n_full, COALESCE(tn.n_trunc, 0) AS n_trunc,
        |  COALESCE(ov.n_overlap, 0) AS n_overlap,
        |  CAST((COALESCE(ov.n_overlap, 0) * 1000000) // fn.n_full
        |    AS BIGINT) AS overlap_micro
        |FROM fn
        |LEFT JOIN tn ON tn.q_id = fn.q_id
        |LEFT JOIN ov ON ov.q_id = fn.q_id
        |ORDER BY fn.q_id""".stripMargin,
    "mm_phash_dups" ->
      """WITH m AS (
        |  SELECT doc_id AS id, text, CAST(strlen(text) AS BIGINT) AS n
        |  FROM documents
        |), cnt AS (
        |  SELECT id, n, b.b AS b,
        |    CAST(len(list_filter(
        |      list_transform(string_split(text, ''), ch -> ord(ch) % 60),
        |      x -> x = b.b)) AS BIGINT) AS c
        |  FROM m, UNNEST(range(0, 60)) AS b(b)
        |), fp AS (
        |  SELECT id,
        |    CAST(SUM(CASE WHEN 60 * c > n THEN CAST(1 AS BIGINT) << b
        |      ELSE 0 END) AS BIGINT) AS phash
        |  FROM cnt GROUP BY id)
        |SELECT phash, CAST(COUNT(*) AS BIGINT) AS n_media,
        |  MIN(id) AS keep_id
        |FROM fp GROUP BY phash
        |HAVING COUNT(*) > 1
        |ORDER BY phash""".stripMargin,
    "eval_minhash_err" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
        |), sig AS (
        |  SELECT id, seed, MIN(md5(seed || '|' || shingle)) AS mh
        |  FROM sh, UNNEST(range(0, 16)) AS sd(seed)
        |  GROUP BY id, seed
        |), bandsig AS (
        |  SELECT id, seed // 4 AS band,
        |    string_agg(mh, ',' ORDER BY seed) AS bsig
        |  FROM sig GROUP BY id, seed // 4
        |), cands AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bandsig a JOIN bandsig b
        |    ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
        |), agree AS (
        |  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS n_agree
        |  FROM cands c
        |  JOIN sig sa ON sa.id = c.id_a
        |  JOIN sig sb ON sb.id = c.id_b AND sb.seed = sa.seed
        |    AND sb.mh = sa.mh
        |  GROUP BY c.id_a, c.id_b
        |), sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh
        |  GROUP BY id),
        |common AS (
        |  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM cands c
        |  JOIN sh a ON a.id = c.id_a
        |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY c.id_a, c.id_b)
        |SELECT g.id_a, g.id_b, g.n_agree,
        |  (g.n_agree * 1000000) // 16 AS est_micro,
        |  (COALESCE(cm.common, 0) * 1000000)
        |    // (sa.sz + sb.sz - COALESCE(cm.common, 0)) AS j_micro,
        |  abs((g.n_agree * 1000000) // 16
        |    - (COALESCE(cm.common, 0) * 1000000)
        |      // (sa.sz + sb.sz - COALESCE(cm.common, 0))) AS err_micro
        |FROM agree g
        |LEFT JOIN common cm ON cm.id_a = g.id_a AND cm.id_b = g.id_b
        |JOIN sizes sa ON sa.id = g.id_a
        |JOIN sizes sb ON sb.id = g.id_b
        |ORDER BY g.id_a, g.id_b""".stripMargin,
    "dq_freshness" ->
      """WITH s AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MAX(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n_events, last_us,
        |  CAST(MAX(last_us) OVER () - last_us AS BIGINT) AS lag_us,
        |  CASE
        |    WHEN MAX(last_us) OVER () - last_us < 3600000000
        |      THEN 'fresh'
        |    WHEN MAX(last_us) OVER () - last_us < 86400000000
        |      THEN 'lagging'
        |    ELSE 'stale' END AS freshness
        |FROM s ORDER BY event_type""".stripMargin,
    "ts_resample_linear" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |    CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |  FROM events WHERE user_id % 10 = 1
        |), hourly AS (
        |  SELECT user_id, hr, CAST(count(*) AS BIGINT) AS n,
        |    MAX(vm) AS vm_hr
        |  FROM ev GROUP BY user_id, hr
        |), bounds AS (
        |  SELECT user_id, MIN(hr) AS hr0, MAX(hr) AS hr1
        |  FROM ev GROUP BY user_id
        |), grid AS (
        |  SELECT user_id, CAST(g.hr AS TIMESTAMP) AS hr
        |  FROM bounds,
        |    UNNEST(generate_series(hr0, hr1, INTERVAL 1 HOUR)) AS g(hr)
        |), j AS (
        |  SELECT g.user_id, g.hr, COALESCE(h.n, 0) AS n, h.vm_hr,
        |    epoch_us(g.hr) // 3600000000 AS hi
        |  FROM grid g LEFT JOIN hourly h
        |    ON h.user_id = g.user_id AND h.hr = g.hr
        |), w AS (
        |  SELECT user_id, hr, n, hi,
        |    LAST_VALUE(vm_hr IGNORE NULLS) OVER wp AS v_p,
        |    LAST_VALUE(CASE WHEN vm_hr IS NOT NULL THEN hi END
        |      IGNORE NULLS) OVER wp AS h_p,
        |    FIRST_VALUE(vm_hr IGNORE NULLS) OVER wn AS v_n,
        |    FIRST_VALUE(CASE WHEN vm_hr IS NOT NULL THEN hi END
        |      IGNORE NULLS) OVER wn AS h_n
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY user_id ORDER BY hr
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, hr, n,
        |  CASE WHEN h_n = h_p THEN v_p
        |    ELSE v_p + ((v_n - v_p) * (hi - h_p)) // (h_n - h_p) END
        |    AS vm_lerp
        |FROM w ORDER BY user_id, hr""".stripMargin,
    "text_rrf_fusion" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS dl,
        |    string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(dl) * 1000 // COUNT(*) AS BIGINT) AS avgdl_milli
        |  FROM docs
        |), tf AS (
        |  SELECT d.doc_id, d.dl, t.term, COUNT(*) AS tf
        |  FROM docs d, UNNEST(d.tk) AS t(term)
        |  WHERE t.term IN ('spark', 'merge', 'window')
        |  GROUP BY d.doc_id, d.dl, t.term
        |), idf AS (
        |  SELECT term, COUNT(*) AS df,
        |    ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) - COUNT(*)
        |        + 0.5)
        |      - ln(COUNT(*) + 0.5) AS idf
        |  FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id, COUNT(*) AS n_terms_hit,
        |    CAST(SUM(CAST(round(idf.idf * (tf.tf * 2.2)
        |      / (tf.tf + (tf.dl * 1000.0
        |        / (SELECT avgdl_milli FROM stats) * 0.75 + 0.25) * 1.2)
        |      * 10000, 0) AS BIGINT)) AS BIGINT) AS score_e4
        |  FROM tf JOIN idf ON idf.term = tf.term
        |  GROUP BY tf.doc_id
        |), sparse AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER
        |      (ORDER BY score_e4 DESC, doc_id) AS BIGINT) AS rank_bm25
        |  FROM scored
        |  QUALIFY rank_bm25 <= 20
        |), ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND e.vec_id <> 0
        |  WHERE q.vec_id = 0
        |  GROUP BY e.vec_id
        |), sims AS (
        |  SELECT d.n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = 0
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), dense AS (
        |  SELECT n_id AS doc_id, CAST(ROW_NUMBER() OVER
        |      (ORDER BY sim DESC, n_id) AS BIGINT) AS rank_cos
        |  FROM sims
        |  QUALIFY rank_cos <= 20
        |), fused AS (
        |  SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
        |    s.rank_bm25, d.rank_cos,
        |    CAST(COALESCE(1000000 // (60 + s.rank_bm25), 0)
        |      + COALESCE(1000000 // (60 + d.rank_cos), 0) AS BIGINT)
        |      AS rrf_micro
        |  FROM sparse s FULL OUTER JOIN dense d ON d.doc_id = s.doc_id)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id)
        |    AS BIGINT) AS rrf_rank,
        |  doc_id, rank_bm25, rank_cos, rrf_micro
        |FROM fused ORDER BY rrf_rank""".stripMargin,
    "ts_ewma" ->
      """WITH v AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), l AS (
        |  SELECT user_id, event_id, vm,
        |    lag(vm, 1) OVER win AS l1, lag(vm, 2) OVER win AS l2,
        |    lag(vm, 3) OVER win AS l3, lag(vm, 4) OVER win AS l4,
        |    lag(vm, 5) OVER win AS l5, lag(vm, 6) OVER win AS l6,
        |    lag(vm, 7) OVER win AS l7
        |  FROM v
        |  WINDOW win AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id, vm,
        |  ((vm * 128 + COALESCE(l1, 0) * 64 + COALESCE(l2, 0) * 32
        |    + COALESCE(l3, 0) * 16 + COALESCE(l4, 0) * 8
        |    + COALESCE(l5, 0) * 4 + COALESCE(l6, 0) * 2
        |    + COALESCE(l7, 0)) * 1000000)
        |  // (128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
        |    + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
        |    + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
        |    + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
        |    + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
        |    + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
        |    + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) AS ewma_micro
        |FROM l ORDER BY user_id, event_id""".stripMargin,
    "text_mix_temperature" ->
      """WITH s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, n_docs,
        |    CAST(SUM(n_docs) OVER () AS BIGINT) AS n_total
        |  FROM s
        |), q AS (
        |  SELECT source, n_docs,
        |    (n_docs * 1000000) // n_total AS p_micro,
        |    CAST(round(sqrt(CAST(n_docs AS DOUBLE) / n_total) * 1000000)
        |      AS BIGINT) AS s_micro
        |  FROM w)
        |SELECT source, n_docs, p_micro, s_micro,
        |  CAST((s_micro * 1000000) // CAST(SUM(s_micro) OVER () AS BIGINT)
        |    AS BIGINT) AS w_micro
        |FROM q ORDER BY source""".stripMargin,
  )
}
