package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-catalog plan guard: no query may silently plan a cartesian
  * product or an unbounded nested-loop join — the two shapes that
  * turn a working sf0.01 query into a 100 TB incident. The whitelist
  * is the EXACT set of queries that cross-join a bounded side by
  * construction (probed with an empty whitelist; every other query
  * in the catalog plans equi-joins only).
  */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // bounded cross joins, each by construction:
  //  - sim_cosine_topk: broadcast 8-row probe-vector table vs corpus
  //  - text_corpus_stats / text_unigram_nll / text_ppl_buckets /
  //    text_tfidf: 1-row corpus-total aggregate rejoined to the facts
  //  - text_sketch_overlap / text_sketch_shingles: 1-row HLL/theta
  //    union vs 1-row exact-count aggregate
  //  - text_bm25_topk / layout_rangeparts: 1-row corpus-stats /
  //    boundary aggregate cross-joined back (kept lazy on purpose)
  //  - sim_ann_pq: broadcast 8-row query lookup-table vs coded corpus
  //    (same shape as sim_cosine_topk — the non-equi self-exclusion
  //    n_id <> q_id makes it a BNLJ over a bounded broadcast side)
  //  - dq_drift: two 1-row bound aggregates (split day, reference
  //    min/max) cross-joined back to events — plan-embedded scalars
  //  - sim_hard_negatives: same broadcast-anchor BNLJ shape as
  //    sim_cosine_topk (cross-label filter is the non-equi condition)
  //  - text_dsir_select / text_kn_bigram: 1-row broadcast totals
  //    (tot / nb) cross-joined back — plan-embedded scalars
  //  - eval_ann_recall: contains the sim_cosine_topk ground-truth
  //    pass (broadcast-anchor BNLJ over the 8-query eval sample)
  //  - text_rrf_fusion: composes text_bm25_topk (1-row corpus-stats
  //    broadcast) and the single-query cosine leg (broadcast-anchor)
  //  - eval_matryoshka_overlap: two sim_cosine_topk legs (broadcast-
  //    anchor BNLJ over the 8-query eval sample)
  //  - dq_t_closeness: dense grid = groups x broadcast band-domain
  //    aggregate (<= 7 rows) — plan-embedded bounded domain
  //  - sim_mips_topk: same broadcast-anchor BNLJ shape as
  //    sim_cosine_topk (8-row probe table, n_id <> q_id non-equi)
  //  - dq_drift_windows: dq_drift's plan-embedded 1-row bound
  //    aggregates plus the 10-row bucket-spine broadcast
  //  - sim_range_search: broadcast-anchor BNLJ (sim_cosine_topk's
  //    shape with a threshold filter instead of top-k)
  //  - text_pmi_collocations: 1-row bigram-total broadcast
  //  - ev_active_users_7d: 1-row max-day broadcast cutting trailing
  //    windows
  //  - q64_rollup_share: 1-row grand-total broadcast attaching the
  //    denominator to the |flags|×|statuses| leaf table
  //  - eval_mrr_ndcg: composes bm25TopK's 1-row corpus-stats
  //    broadcast (same shape as text_bm25_topk)
  //  - cdc_snapshot_at: 1-row seq-cutoff broadcast gating the delta
  //    stream — plan-embedded scalar
  //  - ts_theil_sen: |days|² pair enumeration + 1-row n_days
  //    broadcast, both on the DOMAIN-bounded day table
  //  - ts_mann_kendall: same |days|² pair enumeration as ts_theil_sen
  //    plus 1-row tie/count broadcasts
  //  - sim_query_routing: 1-row corpus-count broadcast attaching the
  //    denominator to the 8-row probe report
  //  - tok_bpe_train3: each round's 1-row argmax merge pair rides as
  //    a broadcast into the vocabulary-sized merge application
  //  - eval_ivf_recall: broadcast-anchor probe×corpus sim pass (the
  //    eval_ann_recall shape) + tiny nprobe-spine non-equi joins
  //  - dq_chi2_independence: dense grid = |sources| × |langs|
  //    marginal cross (bounded domains, the dq_t_closeness shape)
  //  - ev_stickiness: 1-row max-day broadcast cutting trailing
  //    windows (ev_active_users_7d's shape)
  //  - cdc_hot_keys: 1-row total broadcast attaching the share
  //    denominator before the bounded-heap top-10
  //  - sim_ann_sq8 / eval_recall_curve: broadcast-anchor BNLJ over
  //    the 8-query probe table (sim_cosine_topk's shape) plus the
  //    1-row SQ8 [min,max] bounds broadcast
  private val allowCross = Set(
    "sim_ann_sq8", "eval_recall_curve",
    // ev_rfm_scores / ev_lorenz_curve / cdc_backfill_plan: 1-row
    // count broadcast feeding the exact NTILE bucket formula
    // (DistRank rewrite of the global ntile windows)
    "ev_rfm_scores", "cdc_backfill_plan",
    // text_vocab_coverage: 1-row total-occurrence broadcast attaching
    // the coverage denominator to the top-1000 survivors
    "text_vocab_coverage",
    // text_source_kl: 1-row corpus-total broadcast feeding every
    // per-token KL term
    "text_source_kl",
    // dq_distribution_psi: 1-row mid-day broadcast + the bounded
    // |types|x10 bin spine (the dq_t_closeness dense-grid shape)
    "dq_distribution_psi",
    // ts_locf_fill: 1-row day-bounds broadcast building the series x
    // day spine
    "ts_locf_fill",
    // sim_ann_binary: 8-row packed-query broadcast BNLJ over the
    // 16-byte word table (the BQ scan itself, like sim_ann_sq8)
    "sim_ann_binary",
    // pipeline_mix_weights: 1-row totals broadcast into |langs| cells
    "pipeline_mix_weights",
    // cdc_snapshot_diff: two 1-row seq-cutoff broadcasts (the
    // snapshotAtCut convention, same as cdc_snapshot_at)
    "cdc_snapshot_diff",
    // sketch_ams_f2: 1-row exact-F2 broadcast joined to the 16-row
    // estimator table
    "sketch_ams_f2",
    // layout_zonemap_prune: 1-row bounds broadcast into the file-id
    // projections + bounded zone-map/day spines x 6 predicates
    "layout_zonemap_prune",
    // ev_event_study: 1-row pre-window baseline broadcast into the
    // <=15 per-relday cells
    "ev_event_study",
    // ts_xcorr: 1-row type-pair broadcast picking the two series
    "ts_xcorr",
    // sketch_join_size: 1-row exact-join audit broadcast joined to
    // the 16-row estimator table (the sketch_ams_f2 shape)
    "sketch_join_size",
    // text_cluster_topics: 1-row corpus-size broadcast feeding the
    // idf term
    "text_cluster_topics",
    // layout_bloom_prune: 1-row bounds broadcast into file cuts +
    // probe keys; bounded bloom/needs spines
    "layout_bloom_prune",
    // ts_rolling_corr: 1-row type-pair broadcast (the ts_xcorr shape)
    "ts_rolling_corr",
    // eval_multiprobe_recall: the exact ground-truth leg IS
    // sim_cosine_topk's broadcast-anchor BNLJ (8-query probe table)
    "eval_multiprobe_recall",
    // sim_ann_nlist_curve: the same sim_cosine_topk ground-truth leg
    // per curve point, plus a 1-row x 1-row cross stitching the
    // recall aggregate to the probed-candidate-mass aggregate
    "sim_ann_nlist_curve",
    // ev_cuped: 1-row hour-midpoint broadcast into the event scan
    // (the ts_locf_fill shape) + the 2-row arm frame x 1-row pooled
    // moments
    "ev_cuped",
    // graph_eff_diameter: 1-row node-universe broadcast into the
    // <=8-row per-pivot reach frame
    "graph_eff_diameter",
    // ev_survival_km: 1-row horizon broadcast into per-user durations
    "ev_survival_km",
    // ev_bandit_replay: 1-row target-arm broadcast riding into the
    // post-period conditional aggregate
    "ev_bandit_replay",
    // graph_rich_club: bounded 5-row threshold spine cross-joined
    // into the degree/edge tables
    "graph_rich_club",
    // ev_power_analysis: 1-row corpus-moment aggregate x 4-row MDE
    // grid spine
    "ev_power_analysis",
    // dedup_lsh_tuning: three 1-row candidate/verified count
    // aggregates cross-joined per config
    "dedup_lsh_tuning",
    // tok_oov_curve: 3-row K spine + 1-row corpus-total broadcast;
    // graph_conductance: 1-row total-volume broadcast
    "tok_oov_curve", "graph_conductance",
    "cdc_hot_keys",
    "ev_stickiness",
    "dq_chi2_independence",
    "eval_mrr_ndcg", "cdc_snapshot_at", "ts_theil_sen",
    "ts_mann_kendall", "sim_query_routing", "tok_bpe_train3",
    "eval_ivf_recall", "graph_modularity", "sim_mmr_rerank",
    "cdc_tombstone_gc",
    "q64_rollup_share",
    "sim_mips_topk", "dq_drift_windows", "sim_range_search",
    "text_pmi_collocations", "ev_active_users_7d",
    "eval_ann_recall", "text_rrf_fusion", "eval_matryoshka_overlap",
    "dq_t_closeness",
    "sim_cosine_topk", "sim_ann_pq", "sim_pq_rerank",
    "sim_hard_negatives", "text_dsir_select", "text_kn_bigram",
    "pipeline_curate2",
    "text_corpus_stats",
    "text_ppl_buckets",
    "text_sketch_overlap", "text_sketch_shingles", "text_tfidf",
    "text_unigram_nll", "text_bm25_topk", "layout_rangeparts",
    "dq_drift",
    // round-6 additions, each a bounded broadcast by construction:
    //  - dq_iqr_outliers: 1-row Tukey-fence quartile aggregate
    //  - ev_lorenz_curve / text_window_cooccur / graph_louvain_round
    //    / sketch_bloom_fpr: 1-row total/m2/bloom-bits broadcast
    //  - ev_switchback: 1-row baseline-arm aggregate
    //  - sim_ivf_cell_skew: |cells|-bounded literal-centroid scoring
    //    (sim_ann_ivf's shape)
    //  - tok_bpe_encode: per-round 1-row argmax merge broadcast
    //    (tok_bpe_train3's shape)
    //  - mm_av_sync: 7-row lag spine broadcast
    //  - ts_hadamard_energy: 32-row frequency spine broadcast
    //  - sim_topk_shard_merge: broadcast 8-row probe table with the
    //    non-equi self-exclusion (sim_cosine_topk's shape)
    //  - sketch_hll_merge: day=-1 literal equi-key const-folds to a
    //    trivially-true join of two 1-row aggregates
    //  - ev_littles_law: two 1-row aggregates (session totals x
    //    sweep integral) cross-joined
    "dq_iqr_outliers", "ev_lorenz_curve", "text_window_cooccur",
    "graph_louvain_round", "sketch_bloom_fpr", "ev_switchback",
    "sim_ivf_cell_skew", "tok_bpe_encode", "mm_av_sync",
    "ts_hadamard_energy", "sim_topk_shard_merge", "sketch_hll_merge",
    "ev_littles_law",
    // cdc_bootstrap_tail: 1-row sequence-cutoff broadcast (the
    // cdc_snapshot_at shape)
    "cdc_bootstrap_tail",
    // sim_graph_greedy: 8-row broadcast query table (the
    // sim_cosine_topk shape) — entry seeding and the brute-force
    // audit pass both cross the bounded query side
    "sim_graph_greedy",
    // tok_count_sampled: two 1-row aggregates cross-joined
    "tok_count_sampled",
    // dq_ks_test: 1-row day-midpoint broadcast
    "dq_ks_test",
    // sim_filtered_ann / eval_knn_classify: bounded broadcast query
    // tables with the non-equi self-exclusion (sim_cosine_topk shape)
    "sim_filtered_ann", "eval_knn_classify",
    // ev_eb_shrinkage: 1-row global-prior broadcast
    "ev_eb_shrinkage",
    // tok_wordpiece_score: 1-row letter-total broadcast (the
    // text_pmi_collocations shape)
    "tok_wordpiece_score",
    // ev_inactivity_alarms: 1-row final-watermark broadcast
    "ev_inactivity_alarms",
    // ts_spectral_peak: 4-row period spine broadcast (the
    // ts_hadamard_energy shape)
    "ts_spectral_peak",
    // eval_exposure_fairness: sim_cosine_topk's broadcast-probe
    // non-equi pass + two 1-row total broadcasts
    "eval_exposure_fairness",
    // ts_ljung_box / ts_pacf: 1-row global-moment broadcast (shared
    // rhoTable helper)
    "ts_ljung_box", "ts_pacf",
    // embed_anisotropy: two 1-row moment broadcasts
    "embed_anisotropy",
    // sim_ann_opq: 8-row broadcast query table with the non-equi
    // self-exclusion (sim_cosine_topk's shape, like sim_ann_pq)
    "sim_ann_opq",
    // sim_ann_rerank_opq: the same bounded OPQ ADC scan (8-row
    // broadcast probe table, non-equi self-exclusion) feeding the
    // equi-keyed exact-rerank tail — the shortlist join itself is
    // keyed, only the inherited ADC pass crosses the probe table
    "sim_ann_rerank_opq",
    // ts_hurst: 1-row total + 1-row regression-moment broadcasts
    // over a 4-row window spine (the ts_ljung_box shape)
    "ts_hurst")

  // ts_perm_entropy has no cross join: the spine explode is a select
  // on a 1-row aggregate, and the triple joins are hr-equi-keyed

  test("no unplanned cartesian/nested-loop join across all queries") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, TestSpark.sfDir).queryExecution.executedPlan
            .toString
          catch { case e: Throwable => s"PLANFAIL ${e.getMessage}" }
        val bad =
          (plan.contains("CartesianProduct") ||
            plan.contains("BroadcastNestedLoopJoin")) &&
            !allowCross.contains(name)
        if (bad || plan.startsWith("PLANFAIL")) Some(name -> plan.take(400))
        else None
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, p) => s"$n:\n$p" }.mkString("\n\n"))
  }
}
