package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 1: change detection + trend decomposition + shape
  * statistics — the monitoring layer a long-running curation pipeline
  * runs over its own daily output volumes (reference analog: the
  * monitoring surface, StatusServer/MetricRegistry, generalized from
  * liveness counters to distribution-level drift).
  *
  *  - `ts_cusum`: CUSUM changepoint statistic over the daily
  *    event-value series. The classic S_k = cum_k − k·mean form is
  *    rescaled by n (S'_k = n·cum_k − k·total) so every value stays an
  *    exact BIGINT — no mean division, no doubles, order-independent
  *    under any partitioning. The peak |S'| day is the argmax
  *    changepoint candidate (flagged in-plan by a whole-set window).
  *  - `ts_holt`: Holt linear (double-exponential) smoothing with
  *    α = β = 1/2 over the same daily series. The coupled recursion
  *    l_t = ⌊(y_t + l + b)/2⌋, b_t = ⌊(l_t − l + b)/2⌋ runs inside ONE
  *    `aggregate` higher-order lambda over the array-packed series —
  *    sequential in t by construction, and exact because both engines
  *    evaluate the identical `pmod`-floored integer division.
  *  - `q62_skew_kurtosis`: per-event-type skewness and excess kurtosis
  *    from integer power sums (q51's moment contract extended to 3rd/
  *    4th order). The five sums s1..s4,n are exact BIGINTs; the n-scaled
  *    central-moment identities (n³m₃ = n²s₃ − 3n·s₁s₂ + 2s₁³ …) are
  *    evaluated in IEEE doubles with identical expression text in both
  *    engines, and `sqrt` (correctly-rounded, unlike `pow`) is the only
  *    libm call.
  *
  * 100 TB shapes: all three collapse the corpus with one hash-
  * partitioned aggregate (day / event_type) before any window or
  * sequential pass; the day-series windows and the Holt scan run on a
  * DOMAIN-bounded table (days in the data's time range), never on the
  * corpus. For an unbounded per-key Holt (millions of series) the same
  * lambda runs per group after a groupBy-collect bounded by series
  * length, or as a 2×2 matrix prefix-scan when single series exceed a
  * row.
  */
object Ext13Queries {

  /** Daily event-value series on the 1e-3 lattice (the
    * ev_anomaly_zscore quantization convention): day index from the
    * corpus epoch, exact BIGINT sum per day.
    */
  private[graft] def dailySeries(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("day").agg(sum("vm").as("v_day"))

  /** CUSUM over the daily series, n-rescaled to stay integer:
    * S'_k = n·cum_k − k·total = n·(cum_k − k·mean). |S'| peaks at the
    * most likely single changepoint (Page's statistic, two-sided).
    */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    // bounded domain: dailySeries is one row per DAY (horizon-bounded)
    val seq = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailySeries(spark, dir)
      .withColumn("n_days", count(lit(1)).over(all))
      .withColumn("total", sum("v_day").over(all))
      .withColumn("cum", sum("v_day").over(seq))
      .withColumn("k", row_number().over(Window.orderBy("day")))
      .withColumn("s_scaled",
        col("n_days") * col("cum") - col("k") * col("total"))
      .withColumn("is_peak",
        (abs(col("s_scaled")) === max(abs(col("s_scaled"))).over(all))
          .cast("int"))
      .select("day", "v_day", "s_scaled", "is_peak")
      .orderBy("day")
  }

  /** Holt linear smoothing, α = β = 1/2, floored to the integer
    * lattice. The recursion is inherently sequential, so it runs as an
    * `aggregate` lambda over the array-sorted day series — one row in,
    * |days| structs out, exploded back to rows. `pmod`-floor division
    * (`(a − pmod(a,2)) div 2`) makes the halving exact and
    * engine-portable for negative trends too (DuckDB mirrors it as
    * `((a % 2) + 2) % 2`).
    */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    val packed = dailySeries(spark, dir)
      .agg(array_sort(collect_list(struct(col("day"), col("v_day"))))
        .as("s"))
    // nl = new level, repeated inline where the new trend needs it —
    // lambda-local bindings don't exist in SQL HOFs
    val step =
      """aggregate(
        |  slice(s, 2, size(s) - 1),
        |  named_struct(
        |    'l', s[0].v_day, 'b', cast(0 as bigint),
        |    'out', array(named_struct(
        |      'day', s[0].day, 'v_day', s[0].v_day,
        |      'level', s[0].v_day, 'trend', cast(0 as bigint)))),
        |  (acc, x) -> named_struct(
        |    'l', (x.v_day + acc.l + acc.b
        |          - pmod(x.v_day + acc.l + acc.b, 2)) div 2,
        |    'b', ((x.v_day + acc.l + acc.b
        |           - pmod(x.v_day + acc.l + acc.b, 2)) div 2
        |          - acc.l + acc.b
        |          - pmod((x.v_day + acc.l + acc.b
        |                  - pmod(x.v_day + acc.l + acc.b, 2)) div 2
        |                 - acc.l + acc.b, 2)) div 2,
        |    'out', concat(acc.out, array(named_struct(
        |      'day', x.day, 'v_day', x.v_day,
        |      'level', (x.v_day + acc.l + acc.b
        |                - pmod(x.v_day + acc.l + acc.b, 2)) div 2,
        |      'trend', ((x.v_day + acc.l + acc.b
        |                 - pmod(x.v_day + acc.l + acc.b, 2)) div 2
        |                - acc.l + acc.b
        |                - pmod((x.v_day + acc.l + acc.b
        |                        - pmod(x.v_day + acc.l + acc.b, 2)) div 2
        |                       - acc.l + acc.b, 2)) div 2)))),
        |  acc -> acc.out)""".stripMargin
    packed.select(explode(expr(step)).as("h"))
      .select(col("h.day").as("day"), col("h.v_day").as("v_day"),
        col("h.level").as("level"), col("h.trend").as("trend"))
      .orderBy("day")
  }

  /** Skewness + excess kurtosis per event_type from exact integer
    * power sums. s₁³ and s₁⁴ overflow BIGINT at bench scale, so the
    * n-scaled central-moment identities are evaluated in doubles —
    * IEEE-deterministic because the expression text (and hence the
    * rounding sequence) is identical in both engines, and the only
    * libm call is correctly-rounded `sqrt`.
    */
  def skewKurtosis(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(round(value) as bigint)").as("x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .withColumn("skew_r6", expr(
        """round(
          |  (cast(n as double) * n * s3
          |   - 3.0d * n * s1 * s2 + 2.0d * s1 * s1 * s1)
          |  / (cast(n * s2 - s1 * s1 as double)
          |     * sqrt(cast(n * s2 - s1 * s1 as double))), 6)"""
          .stripMargin))
      .withColumn("kurt_r6", expr(
        """round(
          |  (cast(n as double) * n * n * s4
          |   - 4.0d * n * n * s1 * s3 + 6.0d * n * s1 * s1 * s2
          |   - 3.0d * s1 * s1 * s1 * s1)
          |  / (cast(n * s2 - s1 * s1 as double)
          |     * cast(n * s2 - s1 * s1 as double)) - 3.0d, 6)"""
          .stripMargin))
      .select("event_type", "n", "s1", "s2", "s3", "s4", "skew_r6",
        "kurt_r6")
      .orderBy("event_type")

  /** Top user journey trigrams: 30-minute-gap sessions (the engine's
    * session convention, ev_window_session), ordered event-type
    * trigrams within each session, global top-25 with a total
    * (count desc, path) tie-break. The path-mining primitive behind
    * funnel discovery — unlike `ev_funnel` it finds the funnels
    * instead of checking a declared one.
    *
    * 100 TB shape: two per-user windows (session id + leads) over the
    * same (user, time) partitioning — one shuffle, the second window
    * reuses the sort — then a hash aggregate on a bounded path
    * vocabulary (|types|³) and a TakeOrdered(25). Never materializes
    * per-session paths beyond the aggregate.
    */
  /** 30-minute-gap sessionization (the engine's session convention):
    * appends a per-user `sess` ordinal via one (user, time) window
    * pass. Shared by the path-mining and session-stats queries — the
    * downstream windows reuse the same partitioning/sort.
    */
  private[graft] def sessionized(spark: SparkSession, dir: String,
      extra: Seq[String]): DataFrame = {
    val wSeq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapNs = 1800L * 1000000000L
    t(spark, dir, "events")
      .select((Seq("user_id", "event_id", "ts") ++ extra)
        .map(col): _*)
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(wSeq) > gapNs
          or lag(col("ts"), 1).over(wSeq).isNull, 1).otherwise(0))
      .withColumn("sess",
        sum(col("new_sess")).over(
          wSeq.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
  }

  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionized(spark, dir, Seq("event_type"))
    val wPath = Window.partitionBy("user_id", "sess")
      .orderBy("ts", "event_id")
    // bounded domain: one row per distinct 3-step path over the
    // event-type alphabet (≤ |types|³) — not corpus-sized
    val wRank = Window.orderBy(col("n").desc, col("path"))
    sess
      .withColumn("t2", lead(col("event_type"), 1).over(wPath))
      .withColumn("t3", lead(col("event_type"), 2).over(wPath))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 25)
      .select("path", "n", "rank")
      .orderBy("rank")
  }

  /** Bounded-round k-core peel (k = 3, 4 rounds) on the bipartite
    * customer–supplier graph (supplier ids offset by 1e6, the
    * graph_pagerank node convention). Each round drops nodes with
    * degree < k and their edges; after convergence the survivors are
    * exactly the 3-core. The ROUND COUNT is part of the declared
    * contract (both engines unroll the identical 4 rounds), and the
    * spec proves a 5th round is a no-op at test SF — the
    * loud-convergence discipline of `dedup_clusters` applied to
    * peeling.
    *
    * 100 TB shape: per round one degree aggregate + two semi-joins,
    * all hash-partitioned on node id — O(R) shuffles, no driver data
    * access during construction. Unbounded-depth peel cascades want
    * the same fix as connected components: run until a changed-count
    * observation hits zero, failing loudly at a round budget.
    */
  def kcore(spark: SparkSession, dir: String): DataFrame = {
    val k = 3
    val rounds = 4
    val oneWay = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    // cache() per round, deliberately: each round reads the previous
    // round's edge list THREE times (the degree aggregate, and both
    // semi-join probes), so an uncached loop re-evaluates the base
    // orders⋈lineitem subtree ~3^R times — measured 40 s at sf0.1 vs
    // ~1 s cached. CacheManager keys by canonicalized plan, so
    // repeated constructions reuse the same R entries and the bench's
    // between-query clearCache releases them.
    var live = oneWay.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(oneWay.select(col("supp").as("src"),
        col("cust").as("dst")))
      .cache()
    for (_ <- 1 to rounds) {
      val keep = live.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"))
      live = live
        .join(keep.select(col("node").as("src")), Seq("src"),
          "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"),
          "left_semi")
        .cache()
    }
    live.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .orderBy("node")
  }

  /** Zipf-law fit over the token frequency spectrum: OLS of
    * ln(count) on ln(rank) for the top-1000 terms. Both logs are
    * quantized to the micro-nat lattice FIRST (the text_char_entropy
    * convention) so the regression sums are exact BIGINTs; only the
    * final closed-form slope/intercept touch doubles, with identical
    * expression text in both engines. Slope near −1 is the Zipf
    * signature; a flat slope flags synthetic or templated corpora —
    * a cheap corpus-health audit.
    *
    * 100 TB shape: one (term) count aggregate, a top-1000 rank window
    * over the aggregated vocabulary, then a 1-row regression
    * aggregate. At extreme vocabularies the rank window becomes a
    * two-phase count-histogram prefix sum; the regression is
    * unchanged.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    // sort-limit FIRST (TakeOrderedAndProject), then rank only the
    // 1000 survivors — ranking the whole vocabulary in one global
    // window task was the r7-verdict-ask-#4 shape
    val wRank = Window.orderBy(col("cnt").desc, col("tok"))
    t(spark, dir, "documents")
      .select(explode(transform(TextAnalysis.tokens(col("text")),
        w => lower(w))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(1000)
      .withColumn("rank", row_number().over(wRank))
      .select(
        expr("cast(round(ln(rank) * 1000000) as bigint)").as("lx"),
        expr("cast(round(ln(cnt) * 1000000) as bigint)").as("ly"))
      .agg(count(lit(1)).as("n"), sum("lx").as("sx"),
        sum("ly").as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      .select(col("n"),
        expr(
          """round((cast(n as double) * sxy - cast(sx as double) * sy)
            | / (cast(n as double) * sxx
            |    - cast(sx as double) * sx), 6)""".stripMargin)
          .as("slope_r6"),
        expr(
          """round((cast(sy as double)
            |  - ((cast(n as double) * sxy - cast(sx as double) * sy)
            |     / (cast(n as double) * sxx
            |        - cast(sx as double) * sx)) * sx)
            | / cast(n as double), 6)""".stripMargin)
          .as("intercept_r6"))
  }

  /** Flesch reading-ease per document from deterministic proxies:
    * sentences = non-blank [.!?]+ splits, words = whitespace tokens,
    * syllables = vowel-group runs per word (min 1). The three counts
    * are exact integers (hash-comparable on their own); the Flesch
    * formula is one double expression with identical text in both
    * engines. The classic curation quality gate alongside
    * `text_quality`'s ratio features.
    *
    * 100 TB shape: a pure narrow map — per-document lambdas, no
    * shuffle at all before the final sort.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    val words = TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(filter(split(col("text"), "[.!?]+"),
          s => length(trim(s)) > 0)).as("n_sent0"),
        size(words).as("n_words"),
        aggregate(transform(words,
            w => greatest(lit(1), size(regexp_extract_all(lower(w),
              lit("[aeiou]+"), lit(0))))),
          lit(0L), (a, x) => a + x.cast("long")).as("syllables"))
      .select(col("doc_id"),
        greatest(col("n_sent0"), lit(1)).as("n_sent"),
        col("n_words"), col("syllables"))
      .withColumn("flesch_r6", expr(
        """round(206.835d
          | - 1.015d * (cast(n_words as double) / n_sent)
          | - 84.6d * (cast(syllables as double) / n_words), 6)"""
          .stripMargin))
      .orderBy("doc_id")
  }

  /** Incremental maintenance of a per-group TOP-K view under a keyed
    * changelog with retractions — the hardest of the classic IVM
    * shapes, because a deletion can evict a ranked row and pull data
    * from BELOW the maintained boundary. The production answer
    * (Materialize/DBSP top-k, F1's "candidate buffer") is maintained
    * here on a batch micro-update:
    *
    *   - state: per-group top (k+b) CANDIDATES (b = buffer rows), not
    *     just the top k;
    *   - delta step: survivors = candidates minus touched keys;
    *     newTouched = full-history LWW of touched keys (live only);
    *   - SAFE group: ≥ k survivors remain, or the whole group fit in
    *     the candidate set. Every candidate outranks every
    *     non-candidate under the total (vm desc, user asc) order, so
    *     with ≥ k survivors the true top-k ⊆ survivors ∪ newTouched
    *     and one rank window over that union answers the group.
    *   - UNSAFE group (buffer underflow): recompute the group from
    *     maintained per-key state — the refetch branch. The state
    *     itself is delta-maintained ((liveBase ∖ touched) ∪
    *     newTouched), so even the refetch never re-reads history.
    *
    * At 100 TB: candidates and per-key state are group-bucketed
    * stored tables; the delta legs semi-join-prune to touched keys /
    * unsafe groups (partition prune on the bucketed state), so cost
    * follows the delta except for genuinely underflowed groups,
    * which each cost one group-partition scan — the same contract as
    * KeyedTableSink's touched-bucket rewrite. The oracle recomputes
    * the view from scratch; IVM == full is the invariant.
    */
  def ivmTopKCore(ev: DataFrame, k: Int, buf: Int): DataFrame = {
    def live(df: DataFrame): DataFrame =
      KeyedMerge.lww(df, Seq("user_id"), "event_id")
        .filter(!col("del")).drop("del", "event_id")
    val wRank = Window.partitionBy("event_type")
      .orderBy(col("vm").desc, col("user_id"))
    // per-key live state from the base (pre-delta) history; cached —
    // the candidate, group-size, survivor and refetch legs all read it
    val liveBase = live(ev.filter(col("event_id") % 5 =!= 4)).cache()
    val cand = liveBase.withColumn("rk", row_number().over(wRank))
      .filter(col("rk") <= k + buf).drop("rk")
    val gsize = liveBase.groupBy("event_type")
      .agg(count(lit(1)).as("g_n"))
    val touched = ev.filter(col("event_id") % 5 === 4)
      .select("user_id").distinct()
    val survivors = cand.join(touched, Seq("user_id"), "left_anti")
    val newTouched = live(ev.join(touched, Seq("user_id"), "left_semi"))
    val merged = survivors.unionByName(newTouched)
    // buffer-underflow detection per group, over bounded inputs
    val unsafe = gsize
      .join(survivors.groupBy("event_type")
        .agg(count(lit(1)).as("n_surv")), Seq("event_type"), "left")
      .filter(coalesce(col("n_surv"), lit(0L)) < k
        && col("g_n") > (k + buf))
      .select("event_type")
    val safeTopK = merged
      .join(unsafe, Seq("event_type"), "left_anti")
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
    // refetch branch: delta-maintained full state, pruned to the
    // underflowed groups only
    val liveFull = liveBase.join(touched, Seq("user_id"), "left_anti")
      .unionByName(newTouched)
    val refetchTopK = liveFull
      .join(unsafe, Seq("event_type"), "left_semi")
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
    safeTopK.unionByName(refetchTopK)
      .select(col("event_type"), col("user_id"), col("vm"),
        col("rank").cast("int").as("rank"))
      .orderBy("event_type", "rank")
  }

  def ivmTopK(spark: SparkSession, dir: String): DataFrame =
    ivmTopKCore(
      t(spark, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"),
        (col("event_id") % 7 === 0).as("del")),
      k = 3, buf = 2)

  /** Voiced-span merging over the audio-style frame energies
    * (`mm_energy_frames`): consecutive ACTIVE frames collapse into
    * spans via gaps-and-islands — the step after VAD that turns
    * per-frame detections into the clip list a training pipeline
    * actually keeps. Frames stride by 2, so the island key is
    * `frame_idx − row_number` on the HALVED frame number (the raw
    * frame_no increments by 2 per consecutive frame and would break
    * the constant-difference trick).
    *
    * 100 TB shape: rides mm_energy_frames' partition-batched slicing;
    * the island window partitions by media id (bounded frames per
    * clip), and the span aggregate is a narrow per-media groupBy.
    */
  def vadSpans(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    Ext11Queries.energyFrameBase(spark, dir)
      .filter(col("active"))
      .withColumn("grp",
        expr("frame_no div 2") - row_number().over(w))
      .groupBy("media_id", "grp")
      .agg(min("frame_no").as("span_start"),
        max("frame_no").as("span_end"),
        count(lit(1)).as("n_frames"),
        sum("energy").as("energy_sum"))
      .drop("grp")
      .orderBy("media_id", "span_start")
  }

  /** Cluster-size histogram of the near-dup graph — the dedup report
    * a curation run ships (how much of the corpus is duplicated, and
    * in what clump sizes). Reuses the exact `dedup_clusters`
    * component labeling; documents with no near-dup edge are the
    * n_members = 1 row (components have ≥ 2 members by
    * construction, so the singleton row never collides).
    *
    * 100 TB shape: two tiny aggregates over the component labeling
    * (bounded by cluster count) plus one anti-join for the singleton
    * count — the labeling itself is the banded-LSH + large-star/
    * small-star path that already carries the scale contract.
    */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val cc = NearDupGraph.ccLabels(spark, dir)
    val clustered = cc.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"))
      .groupBy("n_members")
      .agg(count(lit(1)).as("n_clusters"))
    val singletons = t(spark, dir, "documents")
      .select(col("doc_id").as("id"))
      .join(cc.select("id"), Seq("id"), "left_anti")
      .agg(lit(1L).as("n_members"), count(lit(1)).as("n_clusters"))
    clustered.unionByName(singletons).orderBy("n_members")
  }

  /** Per-group statistical mode with the (count desc, value asc)
    * total tie-break — the explicit-rule twin of SQL `mode()`, which
    * engines are free to tie-break differently. One (group, value)
    * aggregate plus a rank window over the collapsed lattice.
    */
  def modePerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("n").desc, col("qty"))
    t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("cast(round(l_quantity) as bigint)").as("qty"))
      .groupBy("l_returnflag", "qty")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .select(col("l_returnflag"), col("qty").as("mode_qty"), col("n"))
      .orderBy("l_returnflag")
  }

  /** Mutual-kNN graph over the whole embedding corpus — the
    * navigation structure semantic-dedup / clustering pipelines
    * build (SemDeDup's neighbor graph, k-NN graph clustering).
    * Candidates come from SRP-bucket equality (the corpus-scale LSH
    * path: NO broadcast query set, a bucket-keyed self-join whose
    * fan-out is collision-bounded); each node keeps its top-3 cosine
    * neighbors, and an edge survives only if BOTH endpoints keep it
    * (the mutual filter that prunes hub-induced false neighbors).
    *
    * 100 TB shape: one narrow bucket+norm projection, one equi-join
    * on bucket (the standard banded-candidate contract — raise
    * planes to cut collisions), one per-node rank window, and a
    * semi-join of the directed edge list against its own transpose.
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket",
        Similarity.srpBucket(col("embedding"), planes = 6, dims = 64))
      .withColumn("nrm", Similarity.norm(col("embedding")))
    val a = e.select(col("vec_id").as("id_a"),
      col("embedding").as("va"), col("bucket"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"), col("bucket").as("bucket_b"),
      col("nrm").as("nb"))
    val w = Window.partitionBy("id_a")
      .orderBy(col("sim").desc, col("id_b"))
    val directed = a.join(b,
        col("bucket") === col("bucket_b")
          && col("id_a") =!= col("id_b"))
      .withColumn("sim", round(
        Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")),
        6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("id_a", "id_b", "sim")
    directed
      .join(directed.select(col("id_a").as("id_b"),
        col("id_b").as("id_a")), Seq("id_a", "id_b"), "left_semi")
      .filter(col("id_a") < col("id_b"))
      .orderBy("id_a", "id_b")
  }

  /** ROC AUC of a deterministic scorer via the rank-sum
    * (Mann-Whitney) identity with exact tie handling — the
    * classifier-evaluation primitive that never materializes a curve.
    * Scores collapse to their integer lattice first; doubled average
    * ranks (`2·(cum − cnt) + cnt + 1`) keep tie averaging integral,
    * so the whole statistic including `auc_micro` is BIGINT
    * arithmetic end-to-end — no doubles anywhere.
    *
    * 100 TB shape: one (score) aggregate collapses the corpus to the
    * score lattice; the rank window runs over that DOMAIN-bounded
    * table; the final reduction is a 1-row aggregate.
    */
  def evalAuc(spark: SparkSession, dir: String): DataFrame = {
    val wCum = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    t(spark, dir, "embeddings")
      .select(
        expr("cast(round(cast(element_at(embedding, 1) as double)" +
          " * 1000000) as bigint)").as("score"),
        (col("label") % 2 === 0).cast("long").as("pos"))
      .groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("cnt_pos"))
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("avg_rank2",
        (col("cum") - col("cnt")) * 2 + col("cnt") + 1)
      .agg(sum(col("cnt_pos") * col("avg_rank2")).as("r_pos2"),
        sum(col("cnt_pos")).as("n_pos"),
        sum(col("cnt") - col("cnt_pos")).as("n_neg"))
      .withColumn("auc_micro", expr(
        "((r_pos2 - n_pos * (n_pos + 1)) * 1000000)" +
          " div (2 * n_pos * n_neg)"))
      .select("n_pos", "n_neg", "r_pos2", "auc_micro")
  }

  /** Seasonality strength of the hourly event series via the ANOVA
    * identity on the 25h-detrended values (the `ts_stl_trend`
    * pipeline): strength = SS_between(hour-of-day) / SS_total — the
    * R² of the hod predictor, i.e. how much of the detrended
    * variance the daily cycle explains. Per-hod terms are floored to
    * integers (`S_g² div n_g`) so the cross-group sum is order-free;
    * only the final ratio touches doubles, identical text both
    * engines.
    */
  def seasonalityStrength(spark: SparkSession, dir: String): DataFrame = {
    // bounded domain: one row per HOUR (horizon-bounded)
    val w25 = Window.orderBy("hr").rangeBetween(-12, 12)
    val det = t(spark, dir, "events")
      .select(expr("(ts div 1000) div 3600000000").as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
      .withColumn("n25", count(lit(1)).over(w25))
      .withColumn("sum25", sum("cnt").over(w25))
      .filter(col("n25") === 25)
      .withColumn("x",
        col("cnt") * 1000 - expr("(sum25 * 1000) div 25"))
      .withColumn("hod", expr("hr % 24"))
    det.groupBy("hod")
      .agg(count(lit(1)).as("n_g"), sum("x").as("s_g"),
        sum(col("x") * col("x")).as("q_g"))
      .agg(sum("n_g").as("n"), sum("s_g").as("s"),
        sum("q_g").as("q"),
        sum(expr("(s_g * s_g) div n_g")).as("ssb"))
      .withColumn("strength_r6", expr(
        """round((cast(ssb as double) - cast(s as double) * s / n)
          | / (cast(q as double) - cast(s as double) * s / n), 6)"""
          .stripMargin))
      .select("n", "s", "q", "ssb", "strength_r6")
  }

  /** Degree histogram of the bipartite customer–supplier graph, per
    * side — the one-pass graph profile that sizes skew risk before
    * any join-heavy graph operator runs (the precondition check for
    * `graph_triangles`' degree orientation).
    */
  def degreeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val oneWay = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val deg = oneWay.select(lit("cust").as("side"),
        col("cust").as("node"))
      .unionAll(oneWay.select(lit("supp").as("side"),
        col("supp").as("node")))
      .groupBy("side", "node").agg(count(lit(1)).as("deg"))
    deg.groupBy("side", "deg").agg(count(lit(1)).as("n_nodes"))
      .orderBy("side", "deg")
  }

  /** Session summary distribution: the 30-minute-gap sessions of
    * `ev_top_paths`, collapsed to a (session length → count, total
    * duration) histogram — the engagement profile a product-analytics
    * pipeline reports. Duration stays in exact whole seconds
    * (nanos div 1e9 per session, then summed).
    *
    * 100 TB shape: one (user, time) window pass for session ids, one
    * per-session aggregate, then a histogram aggregate over the
    * bounded session-length lattice.
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame = {
    sessionized(spark, dir, Seq.empty)
      .groupBy("user_id", "sess")
      .agg(count(lit(1)).as("n_events"),
        expr("(max(ts) - min(ts)) div 1000000000")
          .as("duration_sec"))
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"),
        sum("duration_sec").as("total_duration_sec"))
      .orderBy("n_events")
  }

  /** Rollup drill-down with share-of-parent: the (returnflag,
    * linestatus) revenue rollup where every leaf also carries its
    * share of the flag subtotal, and every flag subtotal its share of
    * the grand total — the percent-of-parent drill a BI layer
    * computes. Shares are micro-lattice integral divisions; revenue
    * stays DECIMAL cents end-to-end.
    *
    * 100 TB shape: one rollup aggregate (partial-agg friendly), then
    * two joins on the TINY aggregated levels table (|flags| ×
    * |statuses| rows).
    */
  def rollupShare(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("cast(round(l_extendedprice * 100) as bigint)")
          .as("cents"))
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum("cents").as("revenue_cents"))
      .withColumn("lvl", expr(
        "cast(l_returnflag is null as int) * 2" +
          " + cast(l_linestatus is null as int)"))
    val grand = base.filter(col("lvl") === 3)
      .select(col("revenue_cents").as("grand_cents"))
    val flagTot = base.filter(col("lvl") === 1)
      .select(col("l_returnflag").as("pf"),
        col("revenue_cents").as("flag_cents"))
    base.filter(col("lvl") === 0)
      .join(flagTot, col("l_returnflag") === col("pf"))
      .crossJoin(broadcast(grand))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("revenue_cents"),
        expr("(revenue_cents * 1000000) div flag_cents")
          .as("share_of_flag_micro"),
        expr("(flag_cents * 1000000) div grand_cents")
          .as("flag_share_of_total_micro"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Heaps'-law fit of vocabulary growth: ln(cumulative distinct
    * tokens) regressed on ln(cumulative token count) over the corpus
    * in doc_id order. Cumulative DISTINCT is not subtractable, so it
    * comes from the FIRST-OWNER decomposition (the `text_ngram_novelty`
    * pattern): a token's first-owning doc contributes it exactly once,
    * making cumV a plain running sum. Both logs quantize to the
    * micro-nat lattice before the exact-integer regression sums.
    *
    * 100 TB shape: one token count per doc (narrow), one (token)
    * min-aggregate for first owners, one join back, then DistRank's
    * partitioned two-pass prefix sums (the |docs| table is
    * corpus-sized — no global window) and a 1-row regression.
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(transform(TextAnalysis.tokens(col("text")),
          w => lower(w))).as("tok"))
    val perDoc = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"))
    val newTypes = toks.groupBy("tok")
      .agg(min("doc_id").as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_new"))
    // running totals over the |docs|-sized table: a global cum-sum
    // window would single-partition the corpus (r7 verdict ask #4) —
    // DistRank's two-pass prefix sum keeps it range-partitioned
    val withNew = perDoc.join(newTypes, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_new"))
    DistRank.globalPrefixSums(withNew,
      Seq("n_toks" -> "cum_n", "n_new" -> "cum_v"), 32, col("doc_id"))
      .select(
        expr("cast(round(ln(cum_n) * 1000000) as bigint)").as("lx"),
        expr("cast(round(ln(cum_v) * 1000000) as bigint)").as("ly"))
      .agg(count(lit(1)).as("n"), sum("lx").as("sx"),
        sum("ly").as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"))
      .select(col("n"),
        expr(
          """round((cast(n as double) * sxy - cast(sx as double) * sy)
            | / (cast(n as double) * sxx
            |    - cast(sx as double) * sx), 6)""".stripMargin)
          .as("beta_r6"),
        expr(
          """round((cast(sy as double)
            |  - ((cast(n as double) * sxy - cast(sx as double) * sy)
            |     / (cast(n as double) * sxx
            |        - cast(sx as double) * sx)) * sx)
            | / cast(n as double), 6)""".stripMargin)
          .as("intercept_r6"))
  }

  /** Degree assortativity of the bipartite graph: Pearson correlation
    * (q51's exact-integer-moment contract) between the customer-side
    * and supplier-side degrees ACROSS edges — do high-degree
    * customers trade with high-degree suppliers? The one-number skew
    * coupling metric that decides whether degree-ordered orientation
    * (graph_triangles) is worth it.
    */
  def assortativity(spark: SparkSession, dir: String): DataFrame = {
    val oneWay = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct()
    val degC = oneWay.groupBy("cust").agg(count(lit(1)).as("deg_c"))
    val degS = oneWay.groupBy("supp").agg(count(lit(1)).as("deg_s"))
    oneWay.join(degC, "cust").join(degS, "supp")
      .agg(count(lit(1)).as("n"), sum("deg_c").as("sx"),
        sum("deg_s").as("sy"),
        sum(col("deg_c") * col("deg_c")).as("sxx"),
        sum(col("deg_s") * col("deg_s")).as("syy"),
        sum(col("deg_c") * col("deg_s")).as("sxy"))
      // n·sxy and friends can overflow BIGINT on a dense edge list
      // (n ~ 1e6 edges × degree products ~ 1e7) — evaluate the
      // closed form in doubles with identical text both engines (the
      // q62 skew/kurtosis discipline), sqrt-only libm
      .withColumn("r_r6", expr(
        """round((cast(n as double) * sxy - cast(sx as double) * sy)
          | / (sqrt(cast(n as double) * sxx
          |         - cast(sx as double) * sx)
          |    * sqrt(cast(n as double) * syy
          |           - cast(sy as double) * sy)), 6)"""
          .stripMargin))
      .select("n", "sx", "sy", "sxx", "syy", "sxy", "r_r6")
  }

  /** Nearest-in-time as-of join: for every event, the purchase
    * closest in time in EITHER direction (ties to the past) — the
    * third member of the as-of family (backward q14, forward q60).
    * Composed as one backward + one forward carry pass over the same
    * key partitioning, then a per-row arbitration — no range probe,
    * no interval blow-up.
    *
    * 100 TB shape: two union+carry as-of passes (each one shuffle on
    * the key) + an equi-join on the probe id; identical cost class
    * to running the two directional joins a user would otherwise run
    * separately.
    */
  def asofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tus"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("tus"))
      .agg(min(col("event_id")).as("p_seq"))
      .withColumn("p_tus", col("tus"))
    val probe = ev.select("event_id", "user_id", "tus")
    val back = AsOf.asofJoin(probe, purchases, Seq("user_id"),
        "tus", "tus", Seq("p_seq", "p_tus"))
      .select(col("event_id"), col("user_id"), col("tus"),
        col("p_seq").as("b_seq"), col("p_tus").as("b_tus"))
    val fwd = AsOf.asofJoinForward(probe, purchases, Seq("user_id"),
        "tus", "tus", Seq("p_seq", "p_tus"))
      .select(col("event_id").as("f_event_id"),
        col("p_seq").as("f_seq"), col("p_tus").as("f_tus"))
    back.join(fwd, col("event_id") === col("f_event_id"))
      .select(col("event_id"), col("user_id"),
        expr(
          """case when b_tus is null then f_seq
            |     when f_tus is null then b_seq
            |     when tus - b_tus <= f_tus - tus then b_seq
            |     else f_seq end""".stripMargin).as("nearest_seq"),
        expr(
          """case when b_tus is null then f_tus - tus
            |     when f_tus is null then b_tus - tus
            |     when tus - b_tus <= f_tus - tus then b_tus - tus
            |     else f_tus - tus end""".stripMargin).as("dt_us"))
      .orderBy("event_id")
  }

  /** BFS distance layers (depth ≤ 3) from the seed supplier set
    * (suppkey % 10 = 0) over the bipartite graph — the bounded-depth
    * reachability labeling behind "within N hops of a flagged node"
    * audits. Frontier/visited are cached per round (the k-core
    * lesson: each round's set feeds two consumers).
    */
  def bfsLayers(spark: SparkSession, dir: String): DataFrame = {
    val oneWay = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    val edges = oneWay.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(oneWay.select(col("supp").as("src"),
        col("cust").as("dst")))
      .cache()
    var visited = oneWay
      .filter((col("supp") - 1000000L) % 10 === 0)
      .select(col("supp").as("node")).distinct()
      .withColumn("dist", lit(0)).cache()
    var frontier = visited.select("node")
    for (d <- 1 to 3) {
      frontier = edges
        .join(frontier.select(col("node").as("src")), Seq("src"),
          "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .cache()
      visited = visited
        .unionByName(frontier.withColumn("dist", lit(d)))
        .cache()
    }
    visited.orderBy("node")
  }

  /** Per-cluster radius/compactness report over the IVF k-means
    * quantizer (same fit params as `sim_ann_ivf`, so the quantizer is
    * identical): member count, worst (min) and mean cosine-to-own-
    * centroid per cell — the diagnostics that decide nprobe and flag
    * degenerate cells. Sims quantize to micro ints BEFORE the sum
    * (order-free); the mean divides on the pmod-floored lattice so a
    * negative sum cannot split truncation semantics across engines.
    *
    * 100 TB shape: the narrow literal-centroid projection of
    * `sim_ann_ivf` plus one |cells|-bounded aggregate.
    */
  def clusterRadius(spark: SparkSession, dir: String): DataFrame = {
    val corpus = t(spark, dir, "embeddings")
    val cents = Similarity.fitCentArr(corpus, "vec_id", "embedding",
      nCells = 16, iters = 2, fitSampleMod = 2)
    val centsLit = typedlit(cents.toSeq.map { case (cell, cv) =>
      (cell, cv.toSeq, Similarity.centNorm(cv))
    })
    val v = col("embedding")
    val cands = transform(centsLit, c => struct(
      round(Similarity.dotD(v, c.getField("_2"))
        / (col("__nrm_d") * c.getField("_3")), 6).as("s"),
      (-c.getField("_1")).as("nc"), c.getField("_1").as("c")))
    corpus.select(col("vec_id"), v)
      .withColumn("__nrm_d", Similarity.normD(v))
      .withColumn("best", array_max(cands))
      .select(col("best.c").as("cell"),
        expr("cast(round(best.s * 1000000) as bigint)").as("sim_micro"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        min("sim_micro").as("min_sim_micro"),
        sum("sim_micro").as("sum_sim_micro"))
      .withColumn("mean_sim_micro", expr(
        "(sum_sim_micro - pmod(sum_sim_micro, n_members))" +
          " div n_members"))
      .orderBy("cell")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_ivm_topk" -> ivmTopK _,
    "sim_knn_graph" -> knnGraph _,
    "embed_cluster_radius" -> clusterRadius _,
    "q65_asof_nearest" -> asofNearest _,
    "graph_bfs_layers" -> bfsLayers _,
    "ev_session_stats" -> sessionStats _,
    "q64_rollup_share" -> rollupShare _,
    "tok_vocab_growth" -> vocabGrowth _,
    "graph_assortativity" -> assortativity _,
    "eval_auc" -> evalAuc _,
    "ts_seasonality_strength" -> seasonalityStrength _,
    "graph_degree_histogram" -> degreeHistogram _,
    "mm_vad_spans" -> vadSpans _,
    "dedup_cluster_sizes" -> clusterSizes _,
    "q63_mode" -> modePerGroup _,
    "ts_cusum" -> cusum _,
    "ts_holt" -> holt _,
    "q62_skew_kurtosis" -> skewKurtosis _,
    "ev_top_paths" -> topPaths _,
    "graph_kcore" -> kcore _,
    "text_zipf_fit" -> zipfFit _,
    "text_readability" -> readability _)

  private[graft] val dailySql =
    """SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
      |    AS day,
      |  CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
      |    AS v_day
      |FROM events
      |GROUP BY 1""".stripMargin

  val oracle: Map[String, String] = Map(
    "cdc_ivm_topk" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    (event_id % 7 = 0) AS del
        |  FROM events
        |), lww AS (
        |  SELECT user_id, event_type, vm, del,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |  FROM ev
        |), live AS (
        |  SELECT user_id, event_type, vm FROM lww
        |  WHERE rn = 1 AND NOT del
        |), r AS (
        |  SELECT event_type, user_id, vm,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY vm DESC, user_id) AS rank
        |  FROM live)
        |SELECT event_type, user_id, vm, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,
    "embed_cluster_radius" -> (ExtQueries.ivfFitAssignSql(16, 2, 2) +
      """, rad AS (
        |  SELECT a.cell,
        |    CAST(ROUND(ROUND(d.dot / (nv.nrm * cc.cnrm), 6) * 1000000)
        |      AS BIGINT) AS sim_micro
        |  FROM assign a
        |  JOIN cdF d ON d.vec_id = a.vec_id AND d.cell = a.cell
        |  JOIN norms nv ON nv.vec_id = a.vec_id
        |  JOIN cnF cc ON cc.cell = a.cell)
        |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(MIN(sim_micro) AS BIGINT) AS min_sim_micro,
        |  CAST(SUM(sim_micro) AS BIGINT) AS sum_sim_micro,
        |  CAST((CAST(SUM(sim_micro) AS BIGINT)
        |    - ((CAST(SUM(sim_micro) AS BIGINT) % COUNT(*)) + COUNT(*))
        |      % COUNT(*)) // COUNT(*) AS BIGINT) AS mean_sim_micro
        |FROM rad GROUP BY cell ORDER BY cell""".stripMargin),
    "q65_asof_nearest" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
        |  FROM events
        |), p AS (
        |  SELECT user_id, tus, MIN(event_id) AS p_seq
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, tus
        |), b AS (
        |  SELECT e.event_id, e.user_id, e.tus,
        |    p.p_seq AS b_seq, p.tus AS b_tus
        |  FROM ev e ASOF LEFT JOIN p
        |    ON e.user_id = p.user_id AND e.tus >= p.tus
        |), f AS (
        |  SELECT e.event_id, p.p_seq AS f_seq, p.tus AS f_tus
        |  FROM ev e ASOF LEFT JOIN p
        |    ON e.user_id = p.user_id AND e.tus <= p.tus)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN b_tus IS NULL THEN f_seq
        |       WHEN f_tus IS NULL THEN b_seq
        |       WHEN b.tus - b_tus <= f_tus - b.tus THEN b_seq
        |       ELSE f_seq END AS nearest_seq,
        |  CAST(CASE WHEN b_tus IS NULL THEN f_tus - b.tus
        |       WHEN f_tus IS NULL THEN b_tus - b.tus
        |       WHEN b.tus - b_tus <= f_tus - b.tus THEN b_tus - b.tus
        |       ELSE f_tus - b.tus END AS BIGINT) AS dt_us
        |FROM b JOIN f ON f.event_id = b.event_id
        |ORDER BY b.event_id""".stripMargin,
    "graph_bfs_layers" ->
      """WITH ow AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), ed AS (
        |  SELECT cust AS src, supp AS dst FROM ow
        |  UNION ALL SELECT supp AS src, cust AS dst FROM ow
        |), d0 AS (
        |  SELECT DISTINCT supp AS node FROM ow
        |  WHERE (supp - 1000000) % 10 = 0
        |), f1 AS (
        |  SELECT DISTINCT dst AS node FROM ed
        |  WHERE src IN (SELECT node FROM d0)
        |    AND dst NOT IN (SELECT node FROM d0)
        |), f2 AS (
        |  SELECT DISTINCT dst AS node FROM ed
        |  WHERE src IN (SELECT node FROM f1)
        |    AND dst NOT IN (SELECT node FROM d0)
        |    AND dst NOT IN (SELECT node FROM f1)
        |), f3 AS (
        |  SELECT DISTINCT dst AS node FROM ed
        |  WHERE src IN (SELECT node FROM f2)
        |    AND dst NOT IN (SELECT node FROM d0)
        |    AND dst NOT IN (SELECT node FROM f1)
        |    AND dst NOT IN (SELECT node FROM f2))
        |SELECT node, CAST(0 AS INT) AS dist FROM d0
        |UNION ALL SELECT node, CAST(1 AS INT) FROM f1
        |UNION ALL SELECT node, CAST(2 AS INT) FROM f2
        |UNION ALL SELECT node, CAST(3 AS INT) FROM f3
        |ORDER BY node""".stripMargin,
    "ev_session_stats" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tu FROM events
        |), s AS (
        |  SELECT user_id, event_id, tu,
        |    CASE WHEN lag(tu) OVER w IS NULL
        |           OR tu - lag(tu) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
        |), s2 AS (
        |  SELECT user_id, tu,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY tu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM s
        |), per AS (
        |  SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST((MAX(tu) - MIN(tu)) // 1000000 AS BIGINT)
        |      AS duration_sec
        |  FROM s2 GROUP BY user_id, sess)
        |SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(duration_sec) AS BIGINT) AS total_duration_sec
        |FROM per GROUP BY n_events ORDER BY n_events""".stripMargin,
    "q64_rollup_share" ->
      """WITH q AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |), leaf AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(SUM(cents) AS BIGINT) AS revenue_cents
        |  FROM q GROUP BY l_returnflag, l_linestatus
        |), flag AS (
        |  SELECT l_returnflag,
        |    CAST(SUM(cents) AS BIGINT) AS flag_cents
        |  FROM q GROUP BY l_returnflag
        |), grand AS (
        |  SELECT CAST(SUM(cents) AS BIGINT) AS grand_cents FROM q)
        |SELECT l.l_returnflag, l.l_linestatus, l.revenue_cents,
        |  CAST((l.revenue_cents * 1000000) // f.flag_cents AS BIGINT)
        |    AS share_of_flag_micro,
        |  CAST((f.flag_cents * 1000000) // g.grand_cents AS BIGINT)
        |    AS flag_share_of_total_micro
        |FROM leaf l
        |JOIN flag f ON f.l_returnflag = l.l_returnflag, grand g
        |ORDER BY l.l_returnflag, l.l_linestatus""".stripMargin,
    "tok_vocab_growth" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    lower(unnest(string_split_regex(trim(text), '\s+'))) AS tok
        |  FROM documents
        |), per_doc AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
        |  FROM tk GROUP BY doc_id
        |), new_types AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_new FROM (
        |    SELECT tok, MIN(doc_id) AS doc_id FROM tk GROUP BY tok) f
        |  GROUP BY doc_id
        |), cums AS (
        |  SELECT p.doc_id, p.n_toks, COALESCE(n.n_new, 0) AS n_new,
        |    SUM(p.n_toks) OVER (ORDER BY p.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_n,
        |    SUM(COALESCE(n.n_new, 0)) OVER (ORDER BY p.doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_v
        |  FROM per_doc p LEFT JOIN new_types n ON n.doc_id = p.doc_id
        |), q AS (
        |  SELECT CAST(round(ln(cum_n) * 1000000) AS BIGINT) AS lx,
        |    CAST(round(ln(cum_v) * 1000000) AS BIGINT) AS ly
        |  FROM cums
        |), m AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(lx) AS BIGINT) AS sx,
        |    CAST(SUM(ly) AS BIGINT) AS sy,
        |    CAST(SUM(lx * lx) AS BIGINT) AS sxx,
        |    CAST(SUM(lx * ly) AS BIGINT) AS sxy
        |  FROM q)
        |SELECT n,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |   / (CAST(n AS DOUBLE) * sxx
        |      - CAST(sx AS DOUBLE) * sx), 6) AS beta_r6,
        |  round((CAST(sy AS DOUBLE)
        |    - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |       / (CAST(n AS DOUBLE) * sxx
        |          - CAST(sx AS DOUBLE) * sx)) * sx)
        |   / CAST(n AS DOUBLE), 6) AS intercept_r6
        |FROM m""".stripMargin,
    "graph_assortativity" ->
      """WITH ow AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), dc AS (
        |  SELECT cust, CAST(COUNT(*) AS BIGINT) AS deg_c FROM ow
        |  GROUP BY cust
        |), ds AS (
        |  SELECT supp, CAST(COUNT(*) AS BIGINT) AS deg_s FROM ow
        |  GROUP BY supp
        |), m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(deg_c) AS BIGINT) AS sx,
        |    CAST(SUM(deg_s) AS BIGINT) AS sy,
        |    CAST(SUM(deg_c * deg_c) AS BIGINT) AS sxx,
        |    CAST(SUM(deg_s * deg_s) AS BIGINT) AS syy,
        |    CAST(SUM(deg_c * deg_s) AS BIGINT) AS sxy
        |  FROM ow JOIN dc ON dc.cust = ow.cust
        |  JOIN ds ON ds.supp = ow.supp)
        |SELECT n, sx, sy, sxx, syy, sxy,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |   / (sqrt(CAST(n AS DOUBLE) * sxx
        |           - CAST(sx AS DOUBLE) * sx)
        |      * sqrt(CAST(n AS DOUBLE) * syy
        |             - CAST(sy AS DOUBLE) * sy)), 6) AS r_r6
        |FROM m""".stripMargin,
    "eval_auc" ->
      """WITH sc AS (
        |  SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000)
        |      AS BIGINT) AS score,
        |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
        |  FROM embeddings
        |), g AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(pos) AS BIGINT) AS cnt_pos
        |  FROM sc GROUP BY score
        |), w AS (
        |  SELECT cnt, cnt_pos,
        |    SUM(cnt) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS cum
        |  FROM g
        |), t AS (
        |  SELECT CAST(SUM(cnt_pos * ((cum - cnt) * 2 + cnt + 1))
        |      AS BIGINT) AS r_pos2,
        |    CAST(SUM(cnt_pos) AS BIGINT) AS n_pos,
        |    CAST(SUM(cnt - cnt_pos) AS BIGINT) AS n_neg
        |  FROM w)
        |SELECT n_pos, n_neg, r_pos2,
        |  CAST(((r_pos2 - n_pos * (n_pos + 1)) * 1000000)
        |    // (2 * n_pos * n_neg) AS BIGINT) AS auc_micro
        |FROM t""".stripMargin,
    "ts_seasonality_strength" ->
      """WITH series AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1
        |), win AS (
        |  SELECT hr, cnt,
        |    COUNT(*) OVER w25 AS n25,
        |    SUM(cnt) OVER w25 AS sum25
        |  FROM series
        |  WINDOW w25 AS (ORDER BY hr
        |    RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)
        |), det AS (
        |  SELECT hr % 24 AS hod,
        |    CAST(cnt * 1000 - (sum25 * 1000) // 25 AS BIGINT) AS x
        |  FROM win WHERE n25 = 25
        |), g AS (
        |  SELECT hod, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(x) AS BIGINT) AS s_g,
        |    CAST(SUM(x * x) AS BIGINT) AS q_g
        |  FROM det GROUP BY hod
        |), t AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(s_g) AS BIGINT) AS s,
        |    CAST(SUM(q_g) AS BIGINT) AS q,
        |    CAST(SUM((s_g * s_g) // n_g) AS BIGINT) AS ssb
        |  FROM g)
        |SELECT n, s, q, ssb,
        |  round((CAST(ssb AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
        |   / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
        |    AS strength_r6
        |FROM t""".stripMargin,
    "graph_degree_histogram" ->
      """WITH ow AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), deg AS (
        |  SELECT side, node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        |    SELECT 'cust' AS side, cust AS node FROM ow
        |    UNION ALL SELECT 'supp' AS side, supp AS node FROM ow) u
        |  GROUP BY side, node)
        |SELECT side, deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM deg GROUP BY side, deg ORDER BY side, deg""".stripMargin,
    "sim_knn_graph" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), contrib AS (
        |  SELECT vec_id, p,
        |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0
        |      END) AS c
        |  FROM ee, UNNEST(range(0, 6)) AS pl(p)
        |  GROUP BY vec_id, p
        |), buckets AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY p) AS bucket
        |  FROM contrib GROUP BY vec_id
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee
        |  GROUP BY vec_id
        |), cand AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        |), dots AS (
        |  SELECT c.id_a, c.id_b, SUM(ea.x * eb.x) AS dot
        |  FROM cand c
        |  JOIN ee ea ON ea.vec_id = c.id_a
        |  JOIN ee eb ON eb.vec_id = c.id_b AND eb.i = ea.i
        |  GROUP BY c.id_a, c.id_b
        |), sims AS (
        |  SELECT d.id_a, d.id_b,
        |    ROUND(d.dot / (na.nrm * nb.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms na ON na.vec_id = d.id_a
        |  JOIN norms nb ON nb.vec_id = d.id_b
        |), ranked AS (
        |  SELECT id_a, id_b, sim,
        |    ROW_NUMBER() OVER (PARTITION BY id_a
        |      ORDER BY sim DESC, id_b) AS rank
        |  FROM sims
        |), directed AS (
        |  SELECT id_a, id_b, sim FROM ranked WHERE rank <= 3)
        |SELECT d.id_a, d.id_b, d.sim
        |FROM directed d
        |JOIN directed r ON r.id_a = d.id_b AND r.id_b = d.id_a
        |WHERE d.id_a < d.id_b
        |ORDER BY d.id_a, d.id_b""".stripMargin,
    "mm_vad_spans" ->
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
        |  FROM f
        |), en AS (
        |  SELECT media_id, frame_no,
        |    CAST(COALESCE(list_sum(list_transform(
        |      string_split(fs, ''),
        |      ch -> CAST((ord(ch) - 32) * (ord(ch) - 32) AS BIGINT))),
        |      0) AS BIGINT) AS energy
        |  FROM fr
        |), act AS (
        |  SELECT media_id, frame_no, energy FROM en
        |  WHERE energy > 64 * 1500
        |), isl AS (
        |  SELECT media_id, frame_no, energy,
        |    frame_no // 2 - ROW_NUMBER() OVER (PARTITION BY media_id
        |      ORDER BY frame_no) AS grp
        |  FROM act)
        |SELECT media_id, MIN(frame_no) AS span_start,
        |  MAX(frame_no) AS span_end,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(energy) AS BIGINT) AS energy_sum
        |FROM isl GROUP BY media_id, grp
        |ORDER BY media_id, span_start""".stripMargin,
    "q63_mode" ->
      """WITH q AS (
        |  SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem
        |), c AS (
        |  SELECT l_returnflag, qty, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM q GROUP BY l_returnflag, qty
        |), r AS (
        |  SELECT l_returnflag, qty, n,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY n DESC, qty) AS rk
        |  FROM c)
        |SELECT l_returnflag, qty AS mode_qty, n FROM r
        |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    // composes the dedup_clusters oracle verbatim as a subquery —
    // the histogram MUST agree with the exact labeling it reports on
    "dedup_cluster_sizes" ->
      s"""WITH cc AS (${ExtQueries.oracle("dedup_clusters")}),
        |cs AS (
        |  SELECT cluster, COUNT(*) AS n_members FROM cc
        |  GROUP BY cluster
        |), hist AS (
        |  SELECT CAST(n_members AS BIGINT) AS n_members,
        |    CAST(COUNT(*) AS BIGINT) AS n_clusters
        |  FROM cs GROUP BY n_members
        |), single AS (
        |  SELECT CAST(1 AS BIGINT) AS n_members,
        |    CAST(COUNT(*) AS BIGINT) AS n_clusters
        |  FROM documents
        |  WHERE doc_id NOT IN (SELECT id FROM cc))
        |SELECT * FROM hist UNION ALL SELECT * FROM single
        |ORDER BY n_members""".stripMargin,
    "ts_cusum" ->
      s"""WITH d AS ($dailySql),
        |w AS (
        |  SELECT CAST(day AS INT) AS day, v_day,
        |    COUNT(*) OVER () AS n_days,
        |    SUM(v_day) OVER () AS total,
        |    SUM(v_day) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    ROW_NUMBER() OVER (ORDER BY day) AS k
        |  FROM d)
        |SELECT day, v_day,
        |  CAST(n_days * cum - k * total AS BIGINT) AS s_scaled,
        |  CAST(CASE WHEN abs(n_days * cum - k * total)
        |      = MAX(abs(n_days * cum - k * total)) OVER ()
        |    THEN 1 ELSE 0 END AS INT) AS is_peak
        |FROM w ORDER BY day""".stripMargin,
    "ts_holt" ->
      s"""WITH RECURSIVE d0 AS ($dailySql),
        |d AS (
        |  SELECT CAST(day AS INT) AS day, v_day,
        |    ROW_NUMBER() OVER (ORDER BY day) AS k
        |  FROM d0),
        |h AS (
        |  SELECT k, day, v_day, v_day AS level,
        |    CAST(0 AS BIGINT) AS trend
        |  FROM d WHERE k = 1
        |  UNION ALL
        |  SELECT d.k, d.day, d.v_day,
        |    CAST((d.v_day + h.level + h.trend
        |      - ((((d.v_day + h.level + h.trend) % 2) + 2) % 2)) // 2
        |      AS BIGINT) AS level,
        |    CAST(((d.v_day + h.level + h.trend
        |        - ((((d.v_day + h.level + h.trend) % 2) + 2) % 2)) // 2
        |       - h.level + h.trend
        |       - (((((d.v_day + h.level + h.trend
        |            - ((((d.v_day + h.level + h.trend) % 2) + 2) % 2))
        |            // 2 - h.level + h.trend) % 2) + 2) % 2)) // 2
        |      AS BIGINT) AS trend
        |  FROM h JOIN d ON d.k = h.k + 1)
        |SELECT day, v_day, level, trend FROM h ORDER BY day""".stripMargin,
    "q62_skew_kurtosis" ->
      """WITH e AS (
        |  SELECT event_type, CAST(round(value) AS BIGINT) AS x
        |  FROM events
        |), m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS s1,
        |    CAST(SUM(x * x) AS BIGINT) AS s2,
        |    CAST(SUM(x * x * x) AS BIGINT) AS s3,
        |    CAST(SUM(x * x * x * x) AS BIGINT) AS s4
        |  FROM e GROUP BY event_type)
        |SELECT event_type, n, s1, s2, s3, s4,
        |  round(
        |    (CAST(n AS DOUBLE) * n * s3
        |     - 3.0 * n * s1 * s2 + 2.0 * s1 * s1 * s1)
        |    / (CAST(n * s2 - s1 * s1 AS DOUBLE)
        |       * sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))), 6)
        |    AS skew_r6,
        |  round(
        |    (CAST(n AS DOUBLE) * n * n * s4
        |     - 4.0 * n * n * s1 * s3 + 6.0 * n * s1 * s1 * s2
        |     - 3.0 * s1 * s1 * s1 * s1)
        |    / (CAST(n * s2 - s1 * s1 AS DOUBLE)
        |       * CAST(n * s2 - s1 * s1 AS DOUBLE)) - 3.0, 6)
        |    AS kurt_r6
        |FROM m ORDER BY event_type""".stripMargin,
    "ev_top_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS tu, event_type
        |  FROM events
        |), s AS (
        |  SELECT user_id, event_id, tu, event_type,
        |    CASE WHEN lag(tu) OVER w IS NULL
        |           OR tu - lag(tu) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
        |), s2 AS (
        |  SELECT user_id, event_id, tu, event_type,
        |    SUM(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY tu, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM s
        |), tri AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w2 AS t2,
        |    lead(event_type, 2) OVER w2 AS t3
        |  FROM s2
        |  WINDOW w2 AS (PARTITION BY user_id, sess
        |    ORDER BY tu, event_id)
        |), p AS (
        |  SELECT event_type || '>' || t2 || '>' || t3 AS path
        |  FROM tri WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        |), c AS (
        |  SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p
        |  GROUP BY path)
        |SELECT path, n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path) AS INT)
        |    AS rank
        |FROM c QUALIFY rank <= 25 ORDER BY rank""".stripMargin,
    "graph_kcore" ->
      """WITH ow AS (
        |  SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |), l0 AS (
        |  SELECT cust AS src, supp AS dst FROM ow
        |  UNION ALL SELECT supp AS src, cust AS dst FROM ow
        |), k1 AS (SELECT src FROM l0 GROUP BY src HAVING COUNT(*) >= 3),
        |l1 AS (SELECT src, dst FROM l0
        |  WHERE src IN (SELECT src FROM k1)
        |    AND dst IN (SELECT src FROM k1)),
        |k2 AS (SELECT src FROM l1 GROUP BY src HAVING COUNT(*) >= 3),
        |l2 AS (SELECT src, dst FROM l1
        |  WHERE src IN (SELECT src FROM k2)
        |    AND dst IN (SELECT src FROM k2)),
        |k3 AS (SELECT src FROM l2 GROUP BY src HAVING COUNT(*) >= 3),
        |l3 AS (SELECT src, dst FROM l2
        |  WHERE src IN (SELECT src FROM k3)
        |    AND dst IN (SELECT src FROM k3)),
        |k4 AS (SELECT src FROM l3 GROUP BY src HAVING COUNT(*) >= 3),
        |l4 AS (SELECT src, dst FROM l3
        |  WHERE src IN (SELECT src FROM k4)
        |    AND dst IN (SELECT src FROM k4))
        |SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |FROM l4 GROUP BY src ORDER BY node""".stripMargin,
    "text_zipf_fit" ->
      """WITH tk AS (
        |  SELECT lower(unnest(string_split_regex(trim(text), '\s+')))
        |    AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk
        |  GROUP BY tok
        |), r AS (
        |  SELECT cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
        |  FROM freq QUALIFY rank <= 1000
        |), q AS (
        |  SELECT CAST(round(ln(rank) * 1000000) AS BIGINT) AS lx,
        |    CAST(round(ln(cnt) * 1000000) AS BIGINT) AS ly
        |  FROM r
        |), m AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(lx) AS BIGINT) AS sx,
        |    CAST(SUM(ly) AS BIGINT) AS sy,
        |    CAST(SUM(lx * lx) AS BIGINT) AS sxx,
        |    CAST(SUM(lx * ly) AS BIGINT) AS sxy
        |  FROM q)
        |SELECT n,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |   / (CAST(n AS DOUBLE) * sxx
        |      - CAST(sx AS DOUBLE) * sx), 6) AS slope_r6,
        |  round((CAST(sy AS DOUBLE)
        |    - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |       / (CAST(n AS DOUBLE) * sxx
        |          - CAST(sx AS DOUBLE) * sx)) * sx)
        |   / CAST(n AS DOUBLE), 6) AS intercept_r6
        |FROM m""".stripMargin,
    "text_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    GREATEST(CAST(len(list_filter(
        |      string_split_regex(text, '[.!?]+'),
        |      s -> len(trim(s)) > 0)) AS INT), 1) AS n_sent,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS INT)
        |      AS n_words,
        |    CAST(list_sum(list_transform(
        |      string_split_regex(trim(text), '\s+'),
        |      w -> GREATEST(1, len(regexp_extract_all(lower(w),
        |        '[aeiou]+'))))) AS BIGINT) AS syllables
        |  FROM documents)
        |SELECT doc_id, n_sent, n_words, syllables,
        |  round(206.835
        |   - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
        |   - 84.6 * (CAST(syllables AS DOUBLE) / n_words), 6)
        |    AS flesch_r6
        |FROM c ORDER BY doc_id""".stripMargin)
}
