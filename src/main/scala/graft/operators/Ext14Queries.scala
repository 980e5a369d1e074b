package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch: graph structure metrics + retrieval evaluation —
  * the audit layer above the near-dup graph (is a cluster a clique or
  * a chain?) and above the sparse-retrieval stack (is the index
  * actually ranking relevant documents first?).
  *
  *  - `graph_clustering_coeff`: per-node local clustering coefficient
  *    over the simhash near-dup graph (same maxHamming=5 edge set as
  *    `graph_triangles`, so the two audits describe one graph).
  *    cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) on the 1e-6 lattice —
  *    exact integers end-to-end, `div` == `//` on non-negatives.
  *  - `graph_link_predict`: supplier-substitutability link prediction
  *    over the part–supplier bipartite graph: for supplier pairs
  *    sharing parts, common-neighbor count + the resource-allocation
  *    index Σ_p 1/deg(p), each term floored on the 1e-9 lattice so the
  *    pair score is an exact BIGINT sum in any order.
  *  - `eval_mrr_ndcg`: MRR and NDCG@10 over a 5-query BM25 run.
  *    Binary relevance = document contains ALL query terms. The log2
  *    discount table is a 10-entry micro-lattice LITERAL (identical in
  *    both engines — no cross-engine libm in the metric), and IDCG is
  *    the same literal indexed by the relevant-only rank, so
  *    ndcg = dcg·1e6 div idcg is exact integer arithmetic.
  *
  * 100 TB shapes: clustering coefficient rides the banded simhash
  * candidate join (collision-bounded, never all-pairs) plus one
  * explode-aggregate for degrees; link prediction generates wedges
  * per part with Σ deg² bounded by the maxDeg=64 hub prune (the
  * stop-shingle cut for graphs — at 100 TB a part with thousands of
  * suppliers is list-price noise, not signal), and the pair aggregate
  * output is |suppliers|²-bounded with top-k taken without a global
  * sort; retrieval eval scores only postings of the 13 query terms
  * (index-sized, not corpus-sized) and every window is
  * per-query-id partitioned.
  */
object Ext14Queries {

  // ---------------------------------------------------------------
  // graph_clustering_coeff
  // ---------------------------------------------------------------

  /** Local clustering coefficient from an undirected (a < b) pair
    * list: degree via endpoint explode, per-node triangle counts via
    * the degree-ordered wedge join (`Ext7Queries.triangleCounts`),
    * coefficient on the 1e-6 lattice. Nodes with deg < 2 report 0.
    */
  def clusteringFromPairs(pairs: DataFrame): DataFrame = {
    val deg = pairs
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    Ext7Queries.triangleCounts(pairs)
      .join(deg, Seq("node"), "right")
      .na.fill(0L, Seq("n_triangles"))
      .withColumn("cc_micro",
        when(col("deg") >= 2,
          expr("(2 * n_triangles * 1000000) div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
      .select("node", "deg", "n_triangles", "cc_micro")
      .orderBy("node")
  }

  /** Clustering-coefficient audit of the simhash near-dup graph
    * (the maxHamming=5 edge set `graph_triangles` counts on): tells
    * the dedup pipeline whether transitive collapse is safe (cc → 1,
    * cliques) or over-deletes (cc → 0, chains). The pair list is
    * cached once plan-keyed — `triangleCounts` reads it three times
    * (orientation degrees + both wedge sides) and the outer degree
    * count a fourth; bench's between-query clearCache releases it.
    */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame =
    clusteringFromPairs(
      NearDupGraph.simhashPairs5(spark, dir)
        .select(col("id_a").as("a"), col("id_b").as("b"))
        .cache())

  // ---------------------------------------------------------------
  // graph_link_predict
  // ---------------------------------------------------------------

  /** Link prediction from a bipartite (item, node) edge list: for
    * node pairs sharing items, common-neighbor count and the
    * resource-allocation index Σ_item 1e9 div deg(item). Items with
    * deg(item) > maxDeg are pruned (hub cut) BEFORE the wedge join,
    * bounding per-item pair fan-out at maxDeg².
    */
  def linkPredictFromEdges(edges: DataFrame, maxDeg: Int): DataFrame = {
    // Round-12 reshape (guide §2.4): the old form evaluated the
    // caller's scan+distinct subtree FOUR times (degree aggregate +
    // both wedge sides — plans/r12/graph_link_predict_before.txt: 4
    // parquet scans, 20 Exchanges, zero ReusedExchange) and then
    // self-joined the pruned edge list, a join whose build side is
    // corpus-sized — local stats happened to broadcast it at test
    // SFs, which is exactly the unbounded-side-broadcast shape the
    // r10 audit removed from text_cluster_topics. The per-item
    // sorted neighbor array subsumes all of it: ONE groupBy(item)
    // exchange builds the arrays, the hub cut becomes a size()
    // filter (dc == size(ns) by construction — edges are distinct),
    // ordered pairs explode in-stage (sorted ascending ⇒ id_a <
    // id_b), and the pair aggregate partial-combines map-side before
    // its exchange. Two exchanges total, no join, no corpus-sized
    // broadcast at any scale; fan-out stays bounded at C(maxDeg, 2)
    // per item.
    val nbrs = edges.groupBy("item")
      .agg(sort_array(collect_list(col("node"))).as("ns"))
      .filter(size(col("ns")) <= maxDeg)
      .select(col("ns"), expr("1000000000 div size(ns)").as("ra1"))
    nbrs
      .select(posexplode(col("ns")).as(Seq("i", "id_a")), col("ns"),
        col("ra1"))
      .select(col("id_a"), col("ra1"),
        explode(slice(col("ns"), col("i") + lit(2),
          greatest(size(col("ns")) - col("i") - 1, lit(0))))
          .as("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"), sum(col("ra1")).as("ra_nano"))
      .orderBy(col("ra_nano").desc, col("id_a"), col("id_b"))
      .limit(25)
  }

  /** Supplier-substitutability prediction: supplier pairs sharing
    * parts, scored by resource allocation (rare parts weigh more —
    * two suppliers sharing a 10-supplier part are closer substitutes
    * than two sharing a commodity). maxDeg=64 covers every observed
    * part degree at test SFs (max 52) — the prune is load-bearing
    * only at production scale, exactly like jaccardPairs' maxDf.
    */
  def linkPredict(spark: SparkSession, dir: String): DataFrame =
    linkPredictFromEdges(
      t(spark, dir, "lineitem")
        .select(col("l_partkey").as("item"), col("l_suppkey").as("node"))
        .distinct(),
      maxDeg = 64)

  // ---------------------------------------------------------------
  // eval_mrr_ndcg
  // ---------------------------------------------------------------

  /** round(1e6 / log2(r+1)) for r = 1..10 — precomputed so the
    * discount is a cross-engine literal, not a libm call.
    */
  private val ndcgDiscount: Seq[Long] = Seq(
    1000000L, 630930L, 500000L, 430677L, 386853L,
    356207L, 333333L, 315465L, 301030L, 289065L)

  private val evalQueries: Seq[(Long, Seq[String])] = Seq(
    (1L, Seq("spark", "merge", "window")),
    (2L, Seq("hash", "join", "filter")),
    (3L, Seq("stream", "batch", "sort")),
    (4L, Seq("vector", "scan", "group")),
    (5L, Seq("customer", "order", "query")))

  /** MRR + NDCG@10 of BM25 over the fixed 5-query benchmark set.
    * Per query: rank documents by the bm25TopK scoring contract
    * (e4-quantized per-term contributions, identical text in the
    * oracle), mark a document relevant iff it contains all three
    * query terms, then
    *   rr_micro      = 1e6 div rank(first relevant)
    *   ndcg10_micro  = dcg·1e6 div idcg, discounts from the literal
    *                   lattice; idcg indexes the same lattice by the
    *                   relevant-only rank, so binary-relevance IDCG
    *                   needs no list slicing.
    */
  def evalMrrNdcg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qt = evalQueries
      .flatMap { case (q, ts) => ts.map(term => (q, term)) }
      .toDF("query_id", "term")
    val allTerms = evalQueries.flatMap(_._2).distinct

    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        col("tk"))
    // 1-row corpus stats as a broadcast plan-embedded scalar — lazy
    // construction, same shape (and PlanSweep allowance) as bm25TopK
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs_d"),
      expr("CAST(sum(dl) * 1000 div count(1) AS BIGINT)")
        .as("avgdl_milli"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .filter(col("term").isin(allTerms.map(lit): _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(col("n_docs_d") - col("df") + 0.5) - log(col("df") + 0.5))

    val perDoc = tf
      .join(broadcast(idf.select("term", "idf", "avgdl_milli")), "term")
      .join(broadcast(qt), "term")
      .withColumn("contrib_e4",
        round(col("idf") * (col("tf") * 2.2)
          / (col("tf") + (col("dl") * 1000.0 / col("avgdl_milli")
            * 0.75 + 0.25) * 1.2) * 10000).cast("long"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit"), sum(col("contrib_e4")).as("score_e4"))
      .withColumn("rank", row_number().over(Window
        .partitionBy("query_id")
        .orderBy(col("score_e4").desc, col("doc_id"))))

    val dArr = s"array(${ndcgDiscount.mkString("L,")}L)"
    val rel = perDoc.filter(col("n_hit") === 3)
      .withColumn("rel_rank", row_number().over(Window
        .partitionBy("query_id").orderBy("rank")))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_rel"),
        min("rank").cast("long").as("first_rank"),
        sum(when(col("rank") <= 10,
          expr(s"element_at($dArr, int(rank))")).otherwise(0L))
          .as("dcg"),
        sum(when(col("rel_rank") <= 10,
          expr(s"element_at($dArr, int(rel_rank))")).otherwise(0L))
          .as("idcg"))

    evalQueries.map(_._1).toDF("query_id")
      .join(rel, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_rel", "first_rank", "dcg", "idcg"))
      .withColumn("rr_micro",
        when(col("first_rank") > 0,
          expr("1000000 div first_rank")).otherwise(0L))
      .withColumn("ndcg10_micro",
        when(col("idcg") > 0,
          expr("(dcg * 1000000) div idcg")).otherwise(0L))
      .select("query_id", "n_rel", "first_rank", "rr_micro",
        "ndcg10_micro")
      .orderBy("query_id")
  }

  // ---------------------------------------------------------------
  // cdc_ivm_distinct
  // ---------------------------------------------------------------

  /** Incremental COUNT(DISTINCT) maintenance under a retractable
    * changelog — the one aggregate plain retraction arithmetic cannot
    * maintain (subtracting a count says nothing about whether the
    * VALUE is gone). The standard fix is a support table: S(group,
    * value) = live-row count per value; distinct(group) = |{v :
    * S > 0}|. The delta batch (seq % 5 = 4, erase marker
    * event_id % 7 = 0, the cdc_ivm_agg conventions) adjusts S by
    * group-wise retraction — retract contrib(oldLive | touched), add
    * contrib(newLive | touched) — so only touched keys' state is
    * re-read (semi-join prune; bucketed at 100 TB). The oracle is a
    * full recompute: IVM == full is the invariant. Values are bucketed
    * to vm div 100 so multiplicities are real (support > 1).
    */
  def ivmDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("cast(round(value * 1000) as bigint) div 100").as("bv"),
      (col("event_id") % 7 === 0).as("del"))
    def live(df: DataFrame): DataFrame =
      KeyedMerge.lww(df, Seq("user_id"), "event_id")
        .filter(!col("del"))
    // plan-keyed cache on the LWW result (cdc_ivm_agg's rule): the
    // base state feeds the view leg and the retract leg
    val liveBase = live(ev.filter(col("event_id") % 5 =!= 4)).cache()
    val touched = ev.filter(col("event_id") % 5 === 4)
      .select("user_id").distinct()
    def support(df: DataFrame, sign: Int): DataFrame =
      df.groupBy("event_type", "bv")
        .agg((count(lit(1)) * sign).as("s"))
    support(liveBase, 1)
      .unionByName(support(
        liveBase.join(touched, Seq("user_id"), "left_semi"), -1))
      .unionByName(support(
        live(ev.join(touched, Seq("user_id"), "left_semi")), 1))
      .groupBy("event_type", "bv")
      .agg(sum(col("s")).as("s"))
      .filter(col("s") > 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_distinct"), sum("s").as("n_rows"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // mm_shot_boundaries
  // ---------------------------------------------------------------

  /** Shot-boundary detection over the sampled media frames: a segment
    * break wherever the frame-energy jump exceeds the threshold (the
    * classic intensity-delta cut detector), then gaps-and-islands by
    * running boundary count. Rides mm_energy_frames' partition-batched
    * slicing; per-media windows only — no cross-media shuffle beyond
    * the media_id hash. Threshold 30000 ≈ the p75 inter-frame delta of
    * the corpus, so cuts are real discontinuities, not noise.
    */
  def shotBoundaries(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    Ext11Queries.energyFrameBase(spark, dir)
      .select("media_id", "frame_no", "energy")
      .withColumn("prev_e", lag("energy", 1).over(w))
      .withColumn("boundary",
        (col("prev_e").isNull
          || abs(col("energy") - col("prev_e")) > 30000).cast("long"))
      .withColumn("seg_no", sum("boundary").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("media_id", "seg_no")
      .agg(min("frame_no").as("start_frame"),
        max("frame_no").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum("energy").as("e_sum"))
      .orderBy("media_id", "seg_no")
  }

  // ---------------------------------------------------------------
  // ev_gini
  // ---------------------------------------------------------------

  /** Activity-concentration audit: Gini coefficient and top-decile
    * share of per-user event counts — the "is the corpus a few power
    * users" question a sampling strategy needs answered first. One
    * hash aggregate collapses the corpus to |users| rows; the rank
    * runs on that table via DistRank's partitioned two-pass (|users|
    * is corpus-sized, so no global window). Σ i·x₍ᵢ₎ is tie-order
    * invariant (equal x ⇒ equal contribution under any rank
    * permutation), so the (c, user_id) order is deterministic AND
    * collision-safe. Exact-BIGINT precondition: n_users·total_events
    * < 4.6e12 (holds through sf1 with 10³ headroom; shard the Gini by
    * hash and merge via the grouped-Lorenz identity beyond that).
    */
  def giniActivity(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
    // |users| is corpus-sized — rank via DistRank's partitioned
    // two-pass instead of a single-partition global window (r7
    // verdict ask #4); bit-identical by DistRankSpec
    DistRank.globalRowNumber(counts, "i", 32,
      col("c"), col("user_id"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .agg(
        max("n").as("n_users"),
        sum("c").as("total_events"),
        expr("sum(i * c)").as("iwsum"),
        sum(when(col("i") > col("n") - expr("n div 10"), col("c"))
          .otherwise(0L)).as("top_events"))
      .select(col("n_users"), col("total_events"),
        expr("((2 * iwsum - (n_users + 1) * total_events) * 1000000)" +
          " div (n_users * total_events)").as("gini_micro"),
        expr("(top_events * 1000000) div total_events")
          .as("top_decile_micro"))
  }

  // ---------------------------------------------------------------
  // ts_theil_sen
  // ---------------------------------------------------------------

  /** Theil–Sen robust trend estimate over the daily event-value
    * series: the (lower weighted) median of all pairwise slopes, each
    * slope floored once onto the 1e-6 lattice so the median selection
    * compares exact BIGINTs. The pair enumeration is |days|² on the
    * DOMAIN-bounded day table (the corpus collapses first — ts_cusum's
    * shape), deliberately a 1-row-broadcast nested-loop: at 100 TB the
    * day table is still ~10³ rows. The median uses the cumulative-
    * weight rule (q58's contract), NOT percentile_disc, so parity is
    * by construction.
    */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("day").agg(sum("vm").as("v_day"))
    val a = s.select(col("day").as("da"), col("v_day").as("va"))
    val b = s.select(col("day").as("db"), col("v_day").as("vb"))
    val slopes = a.join(b, col("da") < col("db"))
      .select(expr("((vb - va) * 1000000) div (db - da)").as("slope"))
    val cum = slopes.groupBy("slope").agg(count(lit(1)).as("wv"))
      .withColumn("cw", sum("wv").over(Window.orderBy("slope")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum("wv").over(Window.partitionBy()))
    cum.filter(col("cw") * 2 >= col("tw"))
      .agg(min("slope").as("slope_micro"), max("tw").as("n_pairs"))
      .crossJoin(broadcast(s.agg(count(lit(1)).as("n_days"))))
      .select("n_days", "n_pairs", "slope_micro")
  }

  // ---------------------------------------------------------------
  // ev_markov_entropy
  // ---------------------------------------------------------------

  /** Per-state entropy of the user-journey transition matrix (the
    * ev_markov_transitions pair counts): H(from) = ln(ftot) −
    * (Σ n·ln(n)) / ftot in micro-nats, each ln quantized ONCE to the
    * 1e-6 lattice (text_char_entropy's quantize-each-ln-once rule) so
    * the aggregation is exact-integer and order-free. High-entropy
    * states are journey branch points; near-zero states are funnels —
    * the navigability audit over the same bounded |types|² table.
    */
  def markovEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lnn_micro",
        round(log(col("n").cast("double")) * 1e6).cast("long"))
      .groupBy("from_type")
      .agg(count(lit(1)).as("n_out"),
        sum("n").as("ftot"),
        sum(col("n") * col("lnn_micro")).as("sum_nlnn"))
      .withColumn("h_micro",
        round(log(col("ftot").cast("double")) * 1e6).cast("long")
          - expr("sum_nlnn div ftot"))
      .select("from_type", "n_out", "ftot", "h_micro")
      .orderBy("from_type")
  }

  // ---------------------------------------------------------------
  // ts_burst_days
  // ---------------------------------------------------------------

  /** Burst detection per event type: days whose count exceeds the
    * type's mean by 2σ, decided by the EXACT integer inequality
    * (n·c − s1)² > 4·(n·s2 − s1²) with n·c > s1 — the z > 2 rule
    * n²-rescaled so no mean or variance division ever happens
    * (ts_cusum's discipline extended to second moments). The corpus
    * collapses to the bounded (type, day) table first; the moment
    * windows run per type on that table.
    */
  def burstDays(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    t(spark, dir, "events")
      .select(col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum("c").over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .withColumn("dev_scaled", expr("n * c - s1"))
      .filter(col("dev_scaled") > 0 &&
        expr("dev_scaled * dev_scaled > 4 * (n * s2 - s1 * s1)"))
      .select("event_type", "day", "c", "dev_scaled")
      .orderBy("event_type", "day")
  }

  // ---------------------------------------------------------------
  // dq_uniqueness
  // ---------------------------------------------------------------

  /** (entity label, table, key columns) audited by dq_uniqueness —
    * shared by the Spark plan and the oracle generator so the two
    * can never drift. The last two rows are deliberate NON-unique
    * probes (fan-out keys) so the duplicate statistics are exercised,
    * not vacuously zero. Running it immediately caught a third:
    * the synthetic generator does NOT enforce lineitem's composite
    * (l_orderkey, l_linenumber) key (4599 distinct / 6000 rows at
    * sf0.001) — the violation class the audit exists to surface.
    */
  private val uniquenessEntities: Seq[(String, String, Seq[String])] =
    Seq(
      ("customer.c_custkey", "customer", Seq("c_custkey")),
      ("documents.doc_id", "documents", Seq("doc_id")),
      ("embeddings.vec_id", "embeddings", Seq("vec_id")),
      ("events.event_id", "events", Seq("event_id")),
      ("lineitem.pk", "lineitem", Seq("l_orderkey", "l_linenumber")),
      ("nation.n_nationkey", "nation", Seq("n_nationkey")),
      ("orders.o_orderkey", "orders", Seq("o_orderkey")),
      ("part.p_partkey", "part", Seq("p_partkey")),
      ("region.r_regionkey", "region", Seq("r_regionkey")),
      ("supplier.s_suppkey", "supplier", Seq("s_suppkey")),
      ("events.user_id", "events", Seq("user_id")),
      ("lineitem.l_orderkey", "lineitem", Seq("l_orderkey")))

  /** Key-uniqueness audit across the whole catalog: per declared key,
    * row count, distinct keys, duplicated keys and max multiplicity —
    * the first integrity check a pipeline runs over a new snapshot.
    * Each entity is one hash aggregate on its key (map-side partial,
    * output 1 row); the union is |entities| rows total.
    */
  def uniqueness(spark: SparkSession, dir: String): DataFrame =
    uniquenessEntities.map { case (label, table, keys) =>
      t(spark, dir, table)
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("m"))
        .agg(count(lit(1)).as("n_keys"), sum("m").as("n_rows"),
          sum(when(col("m") > 1, 1L).otherwise(0L)).as("dup_keys"),
          max("m").as("max_mult"))
        .select(lit(label).as("entity"), col("n_rows"), col("n_keys"),
          col("dup_keys"), col("max_mult"))
    }.reduce(_ unionByName _).orderBy("entity")

  // ---------------------------------------------------------------
  // dq_reconciliation
  // ---------------------------------------------------------------

  /** Order-total reconciliation: the stored o_totalprice against the
    * recomputed Σ charge over its line items (TPC-H charge =
    * price·(1−disc)·(1+tax), each product rounded back to scale-2
    * decimal — the engine's money contract), with the signed relative
    * deviation bucketed in 250-permille bands clamped to ±1000. The
    * synthetic totals are independent of the lines, so the histogram
    * is a REAL mismatch distribution — exactly what the audit exists
    * to show. One join orders⋈lineitem, one per-order aggregate, one
    * |buckets|-bounded histogram.
    */
  def reconciliation(spark: SparkSession, dir: String): DataFrame = {
    val charge = expr(
      "round(round(cast(l_extendedprice as decimal(18,2)) * " +
        "(cast(1 as decimal(18,4)) - cast(l_discount as decimal(18,4)))" +
        ", 2) * (cast(1 as decimal(18,4)) + " +
        "cast(l_tax as decimal(18,4))), 2)")
    val recon = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), (charge * 100).cast("long").as("cents"))
      .groupBy("l_orderkey").agg(sum("cents").as("recon_cents"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("stored_cents"))
      .join(recon, col("o_orderkey") === col("l_orderkey"))
      .withColumn("permille", expr(
        "((recon_cents - stored_cents) * 1000) div stored_cents"))
      .withColumn("bucket",
        expr("greatest(least(permille, 1000L), -1000L) div 250"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        min("permille").as("min_permille"),
        max("permille").as("max_permille"))
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------
  // sim_query_routing
  // ---------------------------------------------------------------

  /** ANN probe-cost audit over the SHARED sim_ann_ivf quantizer fit:
    * for each benchmark probe, the nprobe=2 cells it would search and
    * the fraction of the corpus those cells hold — the routing cost
    * model that decides whether an IVF layout actually prunes (a
    * probe landing in a 40% mega-cell says re-fit, not search). Cell
    * ranking is round-6 cosine against the LITERAL centroid array
    * (ties to the lowest cell, cellExpr's rule); corpus cell sizes
    * come from the same narrow assignment projection as embed_kmeans.
    */
  def queryRouting(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val centArr = Similarity.fitCentArr(emb, "vec_id", "embedding",
      nCells = 16, iters = 2, fitSampleMod = 2)
    val centsLit = typedlit(centArr.toSeq.map { case (cell, cv) =>
      (cell, cv.toSeq, Similarity.centNorm(cv))
    })
    val csz = emb
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nd", Similarity.normD(col("v")))
      .withColumn("cell", Similarity.cellExpr(col("v"), col("nd"),
        centArr))
      .groupBy("cell").agg(count(lit(1)).as("sz"))
    val top2 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("v"))
      .withColumn("nrm_d", Similarity.normD(col("v")))
      .select(col("q_id"), col("v"), col("nrm_d"),
        explode(centsLit).as("c"))
      .select(col("q_id"), col("c._1").as("cell"),
        round(Similarity.dotD(col("v"), col("c._2"))
          / (col("nrm_d") * col("c._3")), 6).as("csim"))
      .withColumn("rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("csim").desc, col("cell"))))
      .filter(col("rn") <= 2)
      .groupBy("q_id")
      .agg(min(when(col("rn") === 1, col("cell"))).as("cell_1"),
        min(when(col("rn") === 2, col("cell"))).as("cell_2"))
    top2
      .join(csz.select(col("cell").as("cell_1"), col("sz").as("sz1")),
        Seq("cell_1"), "left")
      .join(csz.select(col("cell").as("cell_2"), col("sz").as("sz2")),
        Seq("cell_2"), "left")
      .na.fill(0L, Seq("sz1", "sz2"))
      .crossJoin(broadcast(emb.agg(count(lit(1)).as("n"))))
      .select(col("q_id"), col("cell_1"), col("cell_2"),
        (col("sz1") + col("sz2")).as("scanned"),
        expr("((sz1 + sz2) * 1000000) div n").as("frac_micro"))
      .orderBy("q_id")
  }

  // ---------------------------------------------------------------
  // ts_mann_kendall
  // ---------------------------------------------------------------

  /** Mann–Kendall trend test over the daily series: S = Σ_{i<j}
    * sign(v_j − v_i), tie-corrected variance numerator
    * varnum = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)  (Var = varnum/18),
    * and the two-sided |Z| > 2 significance decided by the EXACT
    * integer inequality 9·S² > 2·varnum (no continuity correction —
    * the uncorrected statistic keeps everything on the lattice).
    * Complements ts_theil_sen: same |days|² domain-bounded pair
    * enumeration, slope magnitude there, trend significance here.
    */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val s = t(spark, dir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("day").agg(sum("vm").as("v_day"))
    val a = s.select(col("day").as("da"), col("v_day").as("va"))
    val b = s.select(col("day").as("db"), col("v_day").as("vb"))
    val sStat = a.join(b, col("da") < col("db"))
      .agg(sum(when(col("vb") > col("va"), 1L)
        .when(col("vb") < col("va"), -1L).otherwise(0L)).as("s_stat"))
    val ties = s.groupBy("v_day").agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_sum"))
    val n = s.agg(count(lit(1)).as("n_days"))
    sStat.crossJoin(broadcast(ties)).crossJoin(broadcast(n))
      .select(col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_sum")
          .as("varnum"))
      .withColumn("trending",
        expr("9 * s_stat * s_stat > 2 * varnum"))
      .select("n_days", "s_stat", "varnum", "trending")
  }

  // ---------------------------------------------------------------
  // text_diversity
  // ---------------------------------------------------------------

  /** Lexical-diversity report per source: type-token ratio, Simpson
    * concentration Σ f·(f−1) / (N·(N−1)), hapax fraction of the
    * vocabulary, and modal-token share — the corpus-health quartet a
    * mixing strategy reads before weighting a source (low diversity +
    * high concentration = boilerplate). One (source, token) count
    * shuffle, then a |sources|-bounded aggregate; every ratio is a
    * floored micro-lattice division of exact BIGINTs.
    */
  def textDiversity(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("source"), lower(col("tok")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("f"))
      .groupBy("source")
      .agg(sum("f").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("hapax"),
        max("f").as("max_f"),
        sum(expr("f * (f - 1)")).as("sq"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        expr("(vocab * 1000000) div n_tokens").as("ttr_micro"),
        expr("(sq * 1000000) div (n_tokens * (n_tokens - 1))")
          .as("simpson_micro"),
        expr("(hapax * 1000000) div vocab").as("hapax_micro"),
        expr("(max_f * 1000000) div n_tokens").as("top_share_micro"))
      .orderBy("source")

  // ---------------------------------------------------------------
  // tok_bpe_train3
  // ---------------------------------------------------------------

  /** Corpus → (symbol array, count) vocabulary table: the ONE corpus
    * scan the whole BPE trainer pays. Every merge round after this
    * operates on the vocabulary-sized table — the textbook trainer
    * shape (at 100 TB the corpus collapse is the only big job; the
    * merge loop is driver-trivial by comparison but stays declarative
    * here so the oracle can replay it).
    */
  private[operators] def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(split(col("word"), "").as("s"), col("cnt"))

  /** Highest-count adjacent symbol pair (ties: lexicographic on
    * (p1, p2)) — the BPE merge-selection rule.
    */
  private[operators] def bpeBestPair(words: DataFrame): DataFrame =
    words.filter(size(col("s")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(s) - 1), i -> " +
          "struct(element_at(s, i) as p1, element_at(s, i + 1) as p2))"))
        .as("p"))
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum("cnt").as("n"))
      .orderBy(col("n").desc, col("p1"), col("p2")).limit(1)

  /** Left-to-right non-overlapping application of the (p1, p2) merge
    * to every symbol array — "aaa" under merge (a,a) becomes
    * ["aa","a"], never ["aa","aa"]. One aggregate() fold with a
    * skip-next flag; the 1-row best pair rides as a broadcast.
    */
  private[operators] def bpeApplyMerge(words: DataFrame,
      best: DataFrame): DataFrame =
    words.crossJoin(broadcast(best))
      .withColumn("s", expr(
        """aggregate(sequence(1, size(s)),
          |  named_struct('out', cast(array() as array<string>),
          |    'skip', false),
          |  (acc, i) -> case
          |    when acc.skip
          |      then named_struct('out', acc.out, 'skip', false)
          |    when i < size(s) and element_at(s, i) = p1
          |        and element_at(s, i + 1) = p2
          |      then named_struct(
          |        'out', concat(acc.out, array(concat(p1, p2))),
          |        'skip', true)
          |    else named_struct(
          |      'out', concat(acc.out, array(element_at(s, i))),
          |      'skip', false)
          |  end,
          |  acc -> acc.out)""".stripMargin))
      .select("s", "cnt")

  /** Three rounds of actual BPE training (selection + merge + recount
    * — not just the first-pair count): emits each round's chosen
    * merge and its weighted frequency. Every intermediate is cached
    * plan-keyed (the k-core lesson: round r's vocabulary feeds both
    * round r+1's pair count and the merge application; uncached, the
    * corpus scan would re-run ~10×). The DuckDB oracle replays the
    * identical left-to-right rule with one recursive position-walk
    * per round.
    */
  def bpeTrain3(spark: SparkSession, dir: String): DataFrame = {
    val w0 = bpeVocab(spark, dir).cache()
    val b1 = bpeBestPair(w0).cache()
    val w1 = bpeApplyMerge(w0, b1).cache()
    val b2 = bpeBestPair(w1).cache()
    val w2 = bpeApplyMerge(w1, b2).cache()
    val b3 = bpeBestPair(w2).cache()
    def row(r: Int, b: DataFrame): DataFrame =
      b.select(lit(r.toLong).as("round"),
        concat_ws("|", col("p1"), col("p2")).as("pair"), col("n"))
    row(1, b1).unionByName(row(2, b2)).unionByName(row(3, b3))
      .orderBy("round")
  }

  // ---------------------------------------------------------------
  // embed_outliers
  // ---------------------------------------------------------------

  /** Embedding-space outlier report over the SHARED IVF quantizer
    * fit: the 20 vectors farthest (lowest round-6 cosine) from their
    * own cell centroid — the data-cleaning cut a curation pipeline
    * applies before treating cluster membership as a topic label.
    * Assignment is the same literal-centroid argmax as embed_kmeans
    * (ties to the lowest cell); the report is TakeOrdered, never a
    * global sort.
    */
  def embedOutliers(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val centArr = Similarity.fitCentArr(emb, "vec_id", "embedding",
      nCells = 16, iters = 2, fitSampleMod = 2)
    val centsLit = typedlit(centArr.toSeq.map { case (cell, cv) =>
      (cell, cv.toSeq, Similarity.centNorm(cv))
    })
    val own = emb
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nd", Similarity.normD(col("v")))
      .withColumn("best", array_max(transform(centsLit, c => struct(
        round(Similarity.dotD(col("v"), c.getField("_2"))
          / (col("nd") * c.getField("_3")), 6).as("s"),
        (-c.getField("_1")).as("nc"),
        c.getField("_1").as("c")))))
      .select(col("vec_id"), col("best.c").as("cell"),
        col("best.s").as("sim"))
    own.orderBy(col("sim"), col("vec_id")).limit(20)
      // bounded domain: rank runs on the 20 limit() survivors only
      .withColumn("rank", row_number().over(
        Window.orderBy(col("sim"), col("vec_id"))))
      .select("rank", "vec_id", "cell", "sim")
      .orderBy("rank")
  }

  // ---------------------------------------------------------------
  // eval_ivf_recall
  // ---------------------------------------------------------------

  /** Recall@5 of IVF search at nprobe ∈ {1, 2} against the exact
    * cosine top-5 — THE tuning curve for an IVF deployment (how much
    * recall does each extra probed cell buy?). One broadcast
    * probe×corpus similarity pass (8 probes — eval-sized, the
    * eval_ann_recall shape) is shared by the exact leg and both IVF
    * legs; the IVF legs differ only in how deep into the query's
    * cell ranking a corpus vector's cell may sit (probe_rn ≤ nprobe).
    */
  def ivfRecallCurve(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = t(spark, dir, "embeddings")
    val centArr = Similarity.fitCentArr(emb, "vec_id", "embedding",
      nCells = 16, iters = 2, fitSampleMod = 2)
    val centsLit = typedlit(centArr.toSeq.map { case (cell, cv) =>
      (cell, cv.toSeq, Similarity.centNorm(cv))
    })
    val corpusCells = emb
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      .withColumn("n_nrm", Similarity.norm(col("n_vec")))
      .withColumn("nd", Similarity.normD(col("n_vec")))
      .withColumn("cell",
        Similarity.cellExpr(col("n_vec"), col("nd"), centArr))
    val probes = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
    // one probe×corpus sim pass, shared by all legs (plan-keyed cache)
    val sims = corpusCells
      .join(broadcast(probes), col("n_id") =!= col("q_id"))
      .withColumn("sim", round(Similarity.dot(col("q_vec"),
        col("n_vec")) / (col("q_nrm") * col("n_nrm")), 6))
      .select("q_id", "n_id", "cell", "sim")
      .cache()
    val exact = sims
      .withColumn("rk", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rk") <= 5).select("q_id", "n_id")
    // full cell ranking per probe (sim_query_routing's rule)
    val qr = probes
      .withColumn("nrm_d", Similarity.normD(col("q_vec")))
      .select(col("q_id"), col("q_vec"), col("nrm_d"),
        explode(centsLit).as("c"))
      .select(col("q_id"), col("c._1").as("cell"),
        round(Similarity.dotD(col("q_vec"), col("c._2"))
          / (col("nrm_d") * col("c._3")), 6).as("csim"))
      .withColumn("probe_rn", row_number().over(Window
        .partitionBy("q_id").orderBy(col("csim").desc, col("cell"))))
      .select("q_id", "cell", "probe_rn")
    val np = Seq(1L, 2L).toDF("nprobe")
    val hits = sims.join(qr, Seq("q_id", "cell"))
      .join(broadcast(np), col("probe_rn") <= col("nprobe"))
      .withColumn("rk", row_number().over(Window
        .partitionBy("q_id", "nprobe")
        .orderBy(col("sim").desc, col("n_id"))))
      .filter(col("rk") <= 5)
      .join(exact, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id", "nprobe").agg(count(lit(1)).as("hits"))
    probes.select("q_id").crossJoin(broadcast(np))
      .join(hits, Seq("q_id", "nprobe"), "left")
      .na.fill(0L, Seq("hits"))
      .withColumn("recall_micro", expr("(hits * 1000000) div 5"))
      .orderBy("q_id", "nprobe")
  }

  // ---------------------------------------------------------------
  // q67_interval_union
  // ---------------------------------------------------------------

  /** Interval-union coverage per user: events carry a synthetic
    * duration (value-derived, deterministic), overlapping intervals
    * merge into islands by the running-max-end rule, and the report
    * is per-user covered time vs span — the distinct-coverage shape
    * (machine uptime, ad exposure, speech activity) that a plain
    * SUM(duration) double-counts. Two per-user windows on the
    * event-partitioned sort; everything in exact BIGINT microseconds.
    */
  def intervalUnion(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("s"),
        expr("ts div 1000 + cast(round(value * 1000) as bigint) * 1000")
          .as("e"))
      .withColumn("runmax", max("e").over(prior))
      .withColumn("new_island",
        (col("runmax").isNull || col("s") > col("runmax")).cast("long"))
      .withColumn("island", sum("new_island").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_iv"), min("s").as("is_"),
        max("e").as("ie"))
      .groupBy("user_id")
      .agg(sum("n_iv").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(expr("ie - is_")).as("covered_us"),
        (max("ie") - min("is_")).as("span_us"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------
  // ev_new_vs_returning
  // ---------------------------------------------------------------

  /** Daily new-vs-returning user split: a user's first-seen day via
    * one per-user aggregate, then per-day active counts classified
    * against it — the simplest growth-accounting report, with the
    * scale-right shape (two hash aggregates + one day-level join;
    * the corpus is never windowed).
    */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val byDay = t(spark, dir, "events")
      .select(col("user_id"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"))
      .distinct()
    val first = byDay.groupBy("user_id").agg(min("day").as("first_day"))
    byDay.join(first, "user_id")
      .groupBy("day")
      .agg(count(lit(1)).as("active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
          .as("new_users"))
      .withColumn("returning", col("active") - col("new_users"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------
  // graph_modularity
  // ---------------------------------------------------------------

  /** Per-community modularity contribution of the connected-component
    * partition over the MinHash-LSH near-dup graph (same pair set and
    * labeling as dedup_clusters): q_c = (4m·e_c − d_c²) / (4m²) on
    * the 1e-6 lattice. Because CC components close over their edges,
    * e_c counts the whole community's edges and d_c = 2·e_c, so
    * q_c = 4e_c(m − e_c)/(4m²) ≥ 0 — a mega-community with most of
    * the graph's edges scores NEAR ZERO (m ≈ e_c), which is exactly
    * the over-merge signal this audit exists to raise before a
    * transitive collapse deletes half the corpus. Edge list cached
    * once plan-keyed (feeds degrees, labels, per-community counts and
    * the 1-row m broadcast).
    */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.lshPairs(spark, dir)
      .select("id_a", "id_b").cache()
    val labels = NearDupGraph.ccLabels(spark, dir)
      .select(col("id"), col("cluster"))
    val deg = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val dcs = labels.join(deg, "id")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("d_c"))
    val ec = pairs
      .join(labels.select(col("id").as("id_a"), col("cluster")),
        "id_a")
      .groupBy("cluster").agg(count(lit(1)).as("e_c"))
    dcs.join(ec, "cluster")
      .crossJoin(broadcast(pairs.agg(count(lit(1)).as("m"))))
      .withColumn("q_contrib_micro", expr(
        "((4 * m * e_c - d_c * d_c) * 1000000) div (4 * m * m)"))
      .select("cluster", "n_nodes", "e_c", "d_c", "q_contrib_micro")
      .orderBy("cluster")
  }

  // ---------------------------------------------------------------
  // sim_mmr_rerank
  // ---------------------------------------------------------------

  /** Maximal-Marginal-Relevance diversified rerank (λ = 0.5) of probe
    * 0's exact cosine top-10 shortlist down to 5: round 1 takes the
    * highest query similarity; each later round takes
    * argmax(simq − max_{j∈chosen} sim(i, j)) — at λ = ½ that
    * difference IS the MMR objective up to the constant ½, so the
    * selection order is identical and stays on the exact 1e-6 integer
    * lattice (sims quantized once). Candidate cost is shortlist² =
    * 100 pair sims regardless of corpus size — the standard two-stage
    * retrieve-then-diversify shape. The selection loop itself runs on
    * the DRIVER over the collected 10-row shortlist + 90 pair sims
    * (driver-fit by construction, the codebook/centroid rule): the r5
    * unrolled-DataFrame form spent ~15 small jobs on 1-row argmax
    * frames — pure stage-scheduling floor, measured 15.1 s warm at
    * sf1 with zero data dependence on corpus size. Cluster-side work
    * is exactly the two scans that DO scale with the corpus: the
    * shortlist scan and the shortlist-vector fetch.
    */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val probe = emb.filter(col("vec_id") === 0)
    val short = Similarity.cosineTopK(emb, probe, "vec_id",
        "embedding", k = 10)
      .select(col("n_id"),
        expr("cast(round(sim * 1000000) as bigint)").as("simq"))
      .cache()
    val vecs = emb.select(col("vec_id"), col("embedding").as("v"))
      .withColumn("nrm", Similarity.norm(col("v")))
      .join(short.select(col("n_id").as("vec_id")), Seq("vec_id"),
        "left_semi")
    val a = vecs.select(col("vec_id").as("i"), col("v").as("vi"),
      col("nrm").as("ni"))
    val b = vecs.select(col("vec_id").as("j"), col("v").as("vj"),
      col("nrm").as("nj"))
    val cpairs = a.join(broadcast(b), col("i") =!= col("j"))
      // the exact round-6 cosine (cosineTopK's formula), re-quantized
      // once onto the micro lattice
      .withColumn("pm",
        round(round(Similarity.dot(col("vi"), col("vj"))
          / (col("ni") * col("nj")), 6) * 1000000).cast("long"))
      .select("i", "j", "pm")
    // k=10 shortlist + k*(k-1) pair sims: bounded, driver-fit
    val simq = short.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pm = cpairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val picks = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long)] // (rank, n_id, score)
    var chosen = List.empty[Long]
    // never ask for more picks than the shortlist holds: a degenerate
    // corpus whose cosineTopK shortlist has < 5 rows returns a short
    // result (like the pre-driver-loop DataFrame form did) instead of
    // minBy throwing on an exhausted iterator
    for (r <- 1 to math.min(5, simq.size)) {
      // round 1: max simq; later: max(simq - max_{j in chosen} pm);
      // ties broken by id — the identical rule as the SQL oracle
      val (id, score) = simq.keysIterator
        .filterNot(chosen.contains)
        .map { i =>
          val pen =
            if (chosen.isEmpty) 0L else chosen.map(j => pm((i, j))).max
          i -> (simq(i) - pen)
        }
        .minBy { case (i, s) => (-s, i) }
      picks += ((r.toLong, id, score))
      chosen ::= id
    }
    import spark.implicits._
    picks.toSeq.toDF("rank", "n_id", "score").orderBy("rank")
  }

  // ---------------------------------------------------------------
  // mm_tile_grid
  // ---------------------------------------------------------------

  /** 2-D patch grid over the binary media payload — the ViT-patch
    * plumbing: the payload is treated as a row-major image of
    * 64-byte scan lines, each line split into four 16-byte tiles, and
    * every (row, col) patch reports its checksum and non-blank byte
    * count. The tile slicing is pure narrow projection (two bounded
    * explodes); schema/partitioning/batch shape is exactly what a
    * real patch-embedder consumes, with the codec stubbed per the
    * Multimodal contract.
    */
  def tileGrid(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.attachMedia(
      t(spark, dir, "documents"), "doc_id", "text")
    media
      .select(col("media_id"), col("media.payload").as("payload"),
        col("media.meta.n_bytes").as("n_bytes"))
      .withColumn("row", explode(sequence(lit(0),
        greatest(ceil(col("n_bytes") / 64.0).cast("int") - 1, lit(0)))))
      .withColumn("col", explode(sequence(lit(0), lit(3))))
      .withColumn("tile", col("payload")
        .substr(col("row") * 64 + col("col") * 16 + 1, lit(16))
        .cast("string"))
      .filter(length(col("tile")) > 0)
      .select(col("media_id"), col("row").cast("long").as("row"),
        col("col").cast("long").as("col"),
        md5(col("tile")).as("tile_hash"),
        expr("length(regexp_replace(tile, '\\\\s', ''))")
          .cast("long").as("n_ink"))
      .orderBy("media_id", "row", "col")
  }

  // ---------------------------------------------------------------
  // text_prefix_families
  // ---------------------------------------------------------------

  /** Boilerplate-prefix families: documents grouped by the md5 of
    * their first two tokens; families with ≥ 3 members are the
    * repeated-header signal (the cheap precursor to substring dedup —
    * at 100 TB this one hash aggregate triages which prefixes deserve
    * the expensive suffix-array pass). Reports family size and the
    * canonical (minimum) doc id.
    */
  def prefixFamilies(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ",
          expr("slice(split(trim(text), '\\\\s+'), 1, 2)")))
          .as("prefix_hash"))
      .groupBy("prefix_hash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") >= 3)
      .orderBy("prefix_hash")

  // ---------------------------------------------------------------
  // q68_topk_planned
  // ---------------------------------------------------------------

  /** Top-3 orders per customer through the PLANNED grouped top-k
    * operator (plans/GroupedTopKPlan.scala): hash-partitioned
    * bounded-heap selection, no sort anywhere below the presentation
    * ORDER BY — the row-preserving sibling of q26's TopKBy aggregate
    * and the planned counterpart of the window formulation the oracle
    * uses. Tiebreak o_orderkey is a verified-unique key
    * (dq_uniqueness), so the k-boundary is deterministic.
    */
  def topkPlanned(spark: SparkSession, dir: String): DataFrame =
    graft.plans.PlannedTopK.topKPerKey(
        t(spark, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_totalprice")),
        keys = Seq("o_custkey"), score = "o_totalprice",
        tiebreak = Seq("o_orderkey"), k = 3)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)")
          .as("total_cents"),
        col("rank"))
      .orderBy("o_custkey", "rank")

  // ---------------------------------------------------------------
  // dq_referential
  // ---------------------------------------------------------------

  /** (edge label, child table, child FK, parent table, parent key) —
    * the full referential graph of the star schema, shared by the
    * Spark plan and the oracle generator (the dq_uniqueness pattern).
    */
  private val fkEdges: Seq[(String, String, String, String, String)] =
    Seq(
      ("customer.nation", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      ("lineitem.orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      ("lineitem.part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem.supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      ("nation.region", "nation", "n_regionkey",
        "region", "r_regionkey"),
      ("orders.customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      ("supplier.nation", "supplier", "s_nationkey",
        "nation", "n_nationkey"))

  /** Referential-integrity audit over every FK edge of the schema:
    * child rows, orphan rows (left-anti against the parent key) and
    * distinct orphan keys — dq_uniqueness' sibling, completing the
    * constraint-audit pair. Each edge is one anti-join against a
    * (broadcastable) parent key projection; the report is
    * |edges| rows.
    */
  def referential(spark: SparkSession, dir: String): DataFrame =
    fkEdges.map { case (label, ct, ck, pt, pk) =>
      // one outer join + one aggregate per edge (parents are unique-
      // key dims, so the join cannot fan out); orphan = no parent hit
      t(spark, dir, ct).select(col(ck))
        .join(t(spark, dir, pt)
          .select(col(pk).as(ck), lit(1).as("hit")), Seq(ck), "left")
        .agg(count(lit(1)).as("n_child_rows"),
          sum(when(col("hit").isNull, 1L).otherwise(0L))
            .as("n_orphans"),
          countDistinct(when(col("hit").isNull, col(ck)))
            .as("n_orphan_keys"))
        .select(lit(label).as("edge"), col("n_child_rows"),
          col("n_orphans"), col("n_orphan_keys"))
    }.reduce(_ unionByName _).orderBy("edge")

  private val referentialSql: String =
    fkEdges.map { case (label, ct, ck, pt, pk) =>
      s"""SELECT '$label' AS edge,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $ct)
         |    AS n_child_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_orphans,
         |  CAST(COUNT(DISTINCT $ck) AS BIGINT) AS n_orphan_keys
         |FROM $ct c WHERE NOT EXISTS
         |  (SELECT 1 FROM $pt p WHERE p.$pk = c.$ck)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY edge")

  // ---------------------------------------------------------------
  // embed_pq_distortion
  // ---------------------------------------------------------------

  /** PQ quantization-error report over the SHARED sim_ann_pq codebook
    * fit: per (subspace, codeword), member count plus mean and max
    * squared distortion in integer micro-units — the codebook-health
    * audit (a subspace whose distortion dwarfs the others needs more
    * cells or a rotation; embed_cluster_radius' sibling for the PQ
    * stack). Encoding is the same literal-codebook argmin projection
    * the search path uses; the report is nSub×k rows.
    */
  def pqDistortion(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val books = Pq.fitCodebooksFromSample(
      Similarity.fitSample(emb, "vec_id", "embedding", 2),
      nSub = 4, k = 8, iters = 1)
    val subDim = books(0)(0).length
    def sub(vec: Column, m: Int): Column =
      slice(transform(vec, x => x.cast("double")),
        m * subDim + 1, subDim)
    (0 until 4).map { m =>
      emb.select(
          array_min(array(books(m).zipWithIndex.map { case (cv, c) =>
            struct(
              Pq.microExpr(sub(col("embedding"), m), cv.toSeq)
                .as("dm"),
              lit(c).as("cell"))
          }: _*)).as("best"))
        .select(lit(m.toLong).as("m"),
          col("best.cell").cast("long").as("cell"),
          col("best.dm").as("dm"))
    }.reduce(_ unionByName _)
      .groupBy("m", "cell")
      .agg(count(lit(1)).as("n_members"),
        expr("sum(dm) div count(1)").as("mean_d2_micro"),
        max("dm").as("max_d2_micro"))
      .orderBy("m", "cell")
  }

  // ---------------------------------------------------------------
  // ev_audience_overlap
  // ---------------------------------------------------------------

  /** Audience-overlap matrix: for every event-type pair, the distinct
    * user sets' intersection and Jaccard on the micro lattice — the
    * segment-overlap report behind audience planning and feature
    * dedup. One distinct collapse, then a self-join keyed on user
    * whose fan-out is |types-per-user|² (bounded by the tiny type
    * vocabulary), then a |types|²-bounded aggregate.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sets = t(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = sets.groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val both = sets.select(col("event_type").as("type_a"),
        col("user_id"))
      .join(sets.select(col("event_type").as("type_b"),
        col("user_id")), "user_id")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("n_both"))
    both
      .join(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a")), "type_a")
      .join(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b")), "type_b")
      .withColumn("jaccard_micro",
        expr("(n_both * 1000000) div (n_a + n_b - n_both)"))
      .select("type_a", "type_b", "n_a", "n_b", "n_both",
        "jaccard_micro")
      .orderBy("type_a", "type_b")
  }

  // ---------------------------------------------------------------
  // layout_curve_compare
  // ---------------------------------------------------------------

  /** Space-filling-curve shootout on one (custkey, day) point set:
    * bucket by the high bits of the morton (z-order) and hilbert
    * indices — both codegen'd graft expressions — and report each
    * scheme's bucket count and mean/max bounding-box AREA (the
    * file-skipping currency: smaller boxes ⇒ tighter parquet min/max
    * stats ⇒ more pruned files). The quantified version of the
    * layout_zorder / layout_hilbert trade; the oracle replays morton
    * as the 16-term interleave and hilbert as the recursive quadrant
    * fold. On a DENSELY-filled grid (this synthetic corpus) both
    * curves tile into equal fixed-size blocks and the report shows a
    * principled tie — the schemes separate exactly when the point set
    * is sparse/skewed, which is what running the audit on real data
    * is for.
    */
  def curveCompare(spark: SparkSession, dir: String): DataFrame = {
    val day = "datediff(o_orderdate, date'1992-01-01')"
    val pts = t(spark, dir, "orders")
      .select(expr("o_custkey & 65535").as("cust"),
        expr(s"($day) & 65535").as("day"))
    def stats(scheme: String, bucket: Column): DataFrame =
      pts.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          ((max("cust") - min("cust") + 1)
            * (max("day") - min("day") + 1)).as("area"))
        .agg(count(lit(1)).as("n_buckets"), sum("n").as("n_rows"),
          expr("sum(area) div count(1)").as("mean_area"),
          max("area").as("max_area"))
        .select(lit(scheme).as("scheme"), col("n_buckets"),
          col("n_rows"), col("mean_area"), col("max_area"))
    val h = graft.functions.GraftFunctions.hilbert(col("cust"),
      col("day"))
    val z = graft.functions.GraftFunctions.morton(col("cust"),
      col("day"))
    stats("hilbert", shiftright(h, 16))
      .unionByName(stats("morton", shiftright(z, 16)))
      .orderBy("scheme")
  }

  // ---------------------------------------------------------------
  // catalog
  // ---------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_clustering_coeff" -> clusteringCoeff _,
    "graph_link_predict" -> linkPredict _,
    "eval_mrr_ndcg" -> evalMrrNdcg _,
    "cdc_ivm_distinct" -> ivmDistinct _,
    "mm_shot_boundaries" -> shotBoundaries _,
    "ev_gini" -> giniActivity _,
    "ts_theil_sen" -> theilSen _,
    "ev_markov_entropy" -> markovEntropy _,
    "ts_burst_days" -> burstDays _,
    "dq_uniqueness" -> uniqueness _,
    "dq_reconciliation" -> reconciliation _,
    "sim_query_routing" -> queryRouting _,
    "ts_mann_kendall" -> mannKendall _,
    "text_diversity" -> textDiversity _,
    "tok_bpe_train3" -> bpeTrain3 _,
    "embed_outliers" -> embedOutliers _,
    "eval_ivf_recall" -> ivfRecallCurve _,
    "q67_interval_union" -> intervalUnion _,
    "ev_new_vs_returning" -> newVsReturning _,
    "graph_modularity" -> modularity _,
    "sim_mmr_rerank" -> mmrRerank _,
    "mm_tile_grid" -> tileGrid _,
    "text_prefix_families" -> prefixFamilies _,
    "q68_topk_planned" -> topkPlanned _,
    "dq_referential" -> referential _,
    "embed_pq_distortion" -> pqDistortion _,
    "ev_audience_overlap" -> audienceOverlap _,
    "layout_curve_compare" -> curveCompare _)

  /** MMR oracle: shortlist + candidate-pair sims once, then one
    * (chosen-union, penalty, argmax) CTE triple per unrolled round —
    * the identical selection rule as mmrRerank.
    */
  private val mmrSql: String = {
    val head =
      """WITH ee AS MATERIALIZED (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS MATERIALIZED (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee
        |  GROUP BY vec_id
        |), qd AS (
        |  SELECT e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND e.vec_id <> 0
        |  WHERE q.vec_id = 0
        |  GROUP BY e.vec_id
        |), short AS MATERIALIZED (
        |  SELECT qd.n_id,
        |    CAST(round(ROUND(qd.dot / (nq.nrm * ne.nrm), 6) * 1000000)
        |      AS BIGINT) AS simq
        |  FROM qd
        |  JOIN norms nq ON nq.vec_id = 0
        |  JOIN norms ne ON ne.vec_id = qd.n_id
        |  ORDER BY simq DESC, qd.n_id LIMIT 10
        |), cp AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j, SUM(a.x * b.x) AS dot
        |  FROM ee a JOIN ee b ON a.i = b.i AND a.vec_id <> b.vec_id
        |  WHERE a.vec_id IN (SELECT n_id FROM short)
        |    AND b.vec_id IN (SELECT n_id FROM short)
        |  GROUP BY 1, 2
        |), cpairs AS MATERIALIZED (
        |  SELECT cp.i, cp.j,
        |    CAST(round(ROUND(cp.dot / (ni.nrm * nj.nrm), 6) * 1000000)
        |      AS BIGINT) AS pm
        |  FROM cp
        |  JOIN norms ni ON ni.vec_id = cp.i
        |  JOIN norms nj ON nj.vec_id = cp.j
        |), c1 AS MATERIALIZED (
        |  SELECT n_id AS c, simq AS score, CAST(1 AS BIGINT) AS rnk
        |  FROM short ORDER BY simq DESC, n_id LIMIT 1
        |)""".stripMargin
    val rounds = (2 to 5).map { r =>
      val prev = (1 until r).map(k => s"SELECT c FROM c$k")
        .mkString(" UNION ALL ")
      s""", ch$r AS ($prev
         |), pen$r AS (
         |  SELECT p.i, MAX(p.pm) AS pen FROM cpairs p
         |  WHERE p.j IN (SELECT c FROM ch$r) GROUP BY p.i
         |), c$r AS MATERIALIZED (
         |  SELECT s.n_id AS c, s.simq - pen$r.pen AS score,
         |    CAST($r AS BIGINT) AS rnk
         |  FROM short s JOIN pen$r ON pen$r.i = s.n_id
         |  WHERE s.n_id NOT IN (SELECT c FROM ch$r)
         |  ORDER BY score DESC, c LIMIT 1
         |)""".stripMargin
    }.mkString
    val tail = (1 to 5).map(r =>
      s"""SELECT rnk AS "rank", c AS n_id, score FROM c$r""")
      .mkString("\n", "\nUNION ALL\n", "\nORDER BY \"rank\"")
    head + rounds + tail
  }

  /** One BPE round in the oracle: pair-count over the current
    * vocabulary CTE `wPrev`, 1-row argmax `bR`, then the recursive
    * left-to-right position walk producing `wR`. Mirrors
    * bpeBestPair + bpeApplyMerge exactly.
    */
  private[operators] def bpeRoundSql(r: Int, wPrev: String): String = {
    val b = s"b$r"; val mw = s"mw$r"; val w = s"w$r"
    s""", p$r AS (
       |  SELECT s[i] AS p1, s[i + 1] AS p2,
       |    CAST(SUM(cnt) AS BIGINT) AS n
       |  FROM $wPrev, UNNEST(range(1, len(s))) AS rr(i)
       |  WHERE len(s) >= 2
       |  GROUP BY 1, 2
       |), $b AS (
       |  SELECT p1, p2, n FROM p$r ORDER BY n DESC, p1, p2 LIMIT 1
       |), $mw AS (
       |  SELECT s, cnt, 1 AS pos, CAST([] AS VARCHAR[]) AS out
       |  FROM $wPrev
       |  UNION ALL
       |  SELECT s, cnt,
       |    CASE WHEN pos < len(s) AND s[pos] = (SELECT p1 FROM $b)
       |        AND s[pos + 1] = (SELECT p2 FROM $b)
       |      THEN pos + 2 ELSE pos + 1 END,
       |    CASE WHEN pos < len(s) AND s[pos] = (SELECT p1 FROM $b)
       |        AND s[pos + 1] = (SELECT p2 FROM $b)
       |      THEN list_append(out,
       |        (SELECT p1 FROM $b) || (SELECT p2 FROM $b))
       |      ELSE list_append(out, s[pos]) END
       |  FROM $mw WHERE pos <= len(s)
       |), $w AS (
       |  SELECT out AS s, cnt FROM $mw WHERE pos = len(s) + 1
       |)""".stripMargin
  }

  private val uniquenessSql: String =
    uniquenessEntities.map { case (label, table, keys) =>
      s"""SELECT '$label' AS entity,
         |  CAST(SUM(m) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN m > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS dup_keys,
         |  CAST(MAX(m) AS BIGINT) AS max_mult
         |FROM (SELECT COUNT(*) AS m FROM $table
         |      GROUP BY ${keys.mkString(", ")})""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY entity")

  /** Shared CTE: the simhash maxHamming=5 pair list, verbatim from
    * the graph_triangles oracle so both audits describe one graph.
    */
  private[operators] val simhashPairsCte: String =
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
      |  SELECT a.id AS a, b.id AS b
      |  FROM fps a JOIN fps b ON a.id < b.id
      |  WHERE bit_count(xor(a.fp, b.fp)) <= 5
      |)""".stripMargin

  private val ndcgDiscountSql: String =
    s"[${ndcgDiscount.mkString(", ")}]"

  val oracle: Map[String, String] = Map(
    "graph_clustering_coeff" -> (simhashPairsCte +
      """, deg AS (
        |  SELECT node, COUNT(*) AS deg FROM (
        |    SELECT a AS node FROM pairs UNION ALL SELECT b FROM pairs)
        |  GROUP BY node
        |), tri AS (
        |  SELECT e1.a, e1.b, e2.b AS c
        |  FROM pairs e1
        |  JOIN pairs e2 ON e2.a = e1.b
        |  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
        |), tcnt AS (
        |  SELECT node, COUNT(*) AS n_triangles FROM (
        |    SELECT a AS node FROM tri UNION ALL
        |    SELECT b FROM tri UNION ALL
        |    SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
        |  CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
        |  CAST(CASE WHEN d.deg >= 2
        |    THEN (2 * COALESCE(t.n_triangles, 0) * 1000000)
        |      // (d.deg * (d.deg - 1))
        |    ELSE 0 END AS BIGINT) AS cc_micro
        |FROM deg d LEFT JOIN tcnt t ON t.node = d.node
        |ORDER BY d.node""".stripMargin),
    "graph_link_predict" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_partkey AS item, l_suppkey AS node
        |  FROM lineitem
        |), deg AS (
        |  SELECT item, COUNT(*) AS dc FROM edges GROUP BY item
        |  HAVING COUNT(*) <= 64
        |), kept AS (
        |  SELECT e.item, e.node, d.dc
        |  FROM edges e JOIN deg d ON d.item = e.item)
        |SELECT a.node AS id_a, b.node AS id_b,
        |  CAST(COUNT(*) AS BIGINT) AS common,
        |  CAST(SUM(1000000000 // a.dc) AS BIGINT) AS ra_nano
        |FROM kept a JOIN kept b
        |  ON a.item = b.item AND a.node < b.node
        |GROUP BY 1, 2
        |ORDER BY ra_nano DESC, id_a, id_b
        |LIMIT 25""".stripMargin,
    "eval_mrr_ndcg" ->
      s"""WITH queryset(query_id, term) AS (VALUES
        |  ${evalQueries.flatMap { case (q, ts) =>
             ts.map(t0 => s"($q, '$t0')") }.mkString(",\n|  ")}
        |), docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
        |      AS dl,
        |    string_split_regex(trim(text), '\\s+') AS tk
        |  FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(dl) * 1000 // COUNT(*) AS BIGINT) AS avgdl_milli
        |  FROM docs
        |), tf AS (
        |  SELECT d.doc_id, d.dl, t.term, COUNT(*) AS tf
        |  FROM docs d, UNNEST(d.tk) AS t(term)
        |  WHERE t.term IN (SELECT DISTINCT term FROM queryset)
        |  GROUP BY d.doc_id, d.dl, t.term
        |), idf AS (
        |  SELECT term, COUNT(*) AS df,
        |    ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) - COUNT(*)
        |        + 0.5)
        |      - ln(COUNT(*) + 0.5) AS idf
        |  FROM tf GROUP BY term
        |), perdoc AS (
        |  SELECT q.query_id, tf.doc_id, COUNT(*) AS n_hit,
        |    CAST(SUM(CAST(round(idf.idf * (tf.tf * 2.2)
        |      / (tf.tf + (tf.dl * 1000.0
        |        / (SELECT avgdl_milli FROM stats) * 0.75 + 0.25) * 1.2)
        |      * 10000, 0) AS BIGINT)) AS BIGINT) AS score_e4
        |  FROM tf
        |  JOIN idf ON idf.term = tf.term
        |  JOIN queryset q ON q.term = tf.term
        |  GROUP BY q.query_id, tf.doc_id
        |), ranked AS (
        |  SELECT query_id, doc_id, n_hit, score_e4,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score_e4 DESC, doc_id) AS rnk
        |  FROM perdoc
        |), rel AS (
        |  SELECT query_id, rnk,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rnk)
        |      AS rel_rank
        |  FROM ranked WHERE n_hit = 3
        |), agg AS (
        |  SELECT query_id, COUNT(*) AS n_rel,
        |    MIN(rnk) AS first_rank,
        |    SUM(CASE WHEN rnk <= 10
        |      THEN (${ndcgDiscountSql})[CAST(rnk AS INT)]
        |      ELSE 0 END) AS dcg,
        |    SUM(CASE WHEN rel_rank <= 10
        |      THEN (${ndcgDiscountSql})[CAST(rel_rank AS INT)]
        |      ELSE 0 END) AS idcg
        |  FROM rel GROUP BY query_id)
        |SELECT CAST(q.query_id AS BIGINT) AS query_id,
        |  CAST(COALESCE(a.n_rel, 0) AS BIGINT) AS n_rel,
        |  CAST(COALESCE(a.first_rank, 0) AS BIGINT) AS first_rank,
        |  CAST(CASE WHEN COALESCE(a.first_rank, 0) > 0
        |    THEN 1000000 // a.first_rank ELSE 0 END AS BIGINT)
        |    AS rr_micro,
        |  CAST(CASE WHEN COALESCE(a.idcg, 0) > 0
        |    THEN (a.dcg * 1000000) // a.idcg ELSE 0 END AS BIGINT)
        |    AS ndcg10_micro
        |FROM (SELECT DISTINCT query_id FROM queryset) q
        |LEFT JOIN agg a ON a.query_id = q.query_id
        |ORDER BY q.query_id""".stripMargin,
    // full recompute of the maintained distinct view — IVM == full
    // is exactly the invariant under test
    "cdc_ivm_distinct" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) // 100 AS bv,
        |    (event_id % 7 = 0) AS del
        |  FROM events
        |), lww AS (
        |  SELECT * FROM (
        |    SELECT ev.*, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY event_id DESC) AS rn
        |    FROM ev) x
        |  WHERE rn = 1
        |), live AS (SELECT * FROM lww WHERE NOT del)
        |SELECT event_type,
        |  CAST(COUNT(DISTINCT bv) AS BIGINT) AS n_distinct,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM live GROUP BY event_type ORDER BY event_type""".stripMargin,
    // composes the mm_energy_frames oracle verbatim as a CTE so the
    // segment report and the frame energies can never drift
    "mm_shot_boundaries" ->
      (s"WITH ef AS (\n${Ext11Queries.oracle("mm_energy_frames")}\n)" +
      """, b AS (
        |  SELECT media_id, frame_no, energy,
        |    CASE WHEN lag(energy) OVER
        |        (PARTITION BY media_id ORDER BY frame_no) IS NULL
        |      OR abs(energy - lag(energy) OVER
        |        (PARTITION BY media_id ORDER BY frame_no)) > 30000
        |      THEN 1 ELSE 0 END AS boundary
        |  FROM ef
        |), s AS (
        |  SELECT *, SUM(boundary) OVER (PARTITION BY media_id
        |    ORDER BY frame_no ROWS UNBOUNDED PRECEDING) AS seg_no
        |  FROM b)
        |SELECT media_id, CAST(seg_no AS BIGINT) AS seg_no,
        |  MIN(frame_no) AS start_frame, MAX(frame_no) AS end_frame,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(energy) AS BIGINT) AS e_sum
        |FROM s GROUP BY media_id, seg_no
        |ORDER BY media_id, seg_no""".stripMargin),
    "ev_gini" ->
      """WITH counts AS (
        |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
        |), ranked AS (
        |  SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS i,
        |    COUNT(*) OVER () AS n
        |  FROM counts
        |), agg AS (
        |  SELECT MAX(n) AS n_users,
        |    CAST(SUM(c) AS BIGINT) AS total_events,
        |    CAST(SUM(i * c) AS BIGINT) AS iwsum,
        |    CAST(SUM(CASE WHEN i > n - n // 10 THEN c ELSE 0 END)
        |      AS BIGINT) AS top_events
        |  FROM ranked)
        |SELECT CAST(n_users AS BIGINT) AS n_users, total_events,
        |  CAST(((2 * iwsum - (n_users + 1) * total_events) * 1000000)
        |    // (n_users * total_events) AS BIGINT) AS gini_micro,
        |  CAST((top_events * 1000000) // total_events AS BIGINT)
        |    AS top_decile_micro
        |FROM agg""".stripMargin,
    "ts_theil_sen" ->
      """WITH d AS (
        |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_day
        |  FROM events
        |  GROUP BY 1
        |), p AS (
        |  SELECT ((b.v_day - a.v_day) * 1000000) // (b.day - a.day)
        |    AS slope
        |  FROM d a JOIN d b ON a.day < b.day
        |), bys AS (
        |  SELECT slope, COUNT(*) AS wv FROM p GROUP BY slope
        |), cum AS (
        |  SELECT slope, wv,
        |    SUM(wv) OVER (ORDER BY slope ROWS UNBOUNDED PRECEDING)
        |      AS cw,
        |    SUM(wv) OVER () AS tw
        |  FROM bys)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days,
        |  CAST(MAX(tw) AS BIGINT) AS n_pairs,
        |  CAST(MIN(slope) AS BIGINT) AS slope_micro
        |FROM cum WHERE cw * 2 >= tw""".stripMargin,
    "ev_markov_entropy" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS ft,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS tt
        |  FROM events
        |), pairs AS (
        |  SELECT ft, tt, COUNT(*) AS n FROM seq
        |  WHERE tt IS NOT NULL GROUP BY ft, tt
        |), q AS (
        |  SELECT ft, n,
        |    CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
        |      AS lnn_micro
        |  FROM pairs
        |), g AS (
        |  SELECT ft AS from_type, CAST(COUNT(*) AS BIGINT) AS n_out,
        |    CAST(SUM(n) AS BIGINT) AS ftot,
        |    CAST(SUM(n * lnn_micro) AS BIGINT) AS sum_nlnn
        |  FROM q GROUP BY ft)
        |SELECT from_type, n_out, ftot,
        |  CAST(round(ln(CAST(ftot AS DOUBLE)) * 1e6) AS BIGINT)
        |    - sum_nlnn // ftot AS h_micro
        |FROM g ORDER BY from_type""".stripMargin,
    "ts_burst_days" ->
      """WITH byday AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, day, CAST(c AS BIGINT) AS c,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS s1,
        |    CAST(SUM(c * c) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS s2
        |  FROM byday)
        |SELECT event_type, day, c,
        |  CAST(n * c - s1 AS BIGINT) AS dev_scaled
        |FROM m
        |WHERE n * c - s1 > 0
        |  AND (n * c - s1) * (n * c - s1) > 4 * (n * s2 - s1 * s1)
        |ORDER BY event_type, day""".stripMargin,
    "dq_uniqueness" -> uniquenessSql,
    "dq_reconciliation" ->
      """WITH recon AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(ROUND(ROUND(
        |      CAST(l_extendedprice AS DECIMAL(18,2))
        |        * (CAST(1 AS DECIMAL(18,4))
        |           - CAST(l_discount AS DECIMAL(18,4))), 2)
        |      * (CAST(1 AS DECIMAL(18,4))
        |         + CAST(l_tax AS DECIMAL(18,4))), 2) * 100 AS BIGINT))
        |      AS BIGINT) AS recon_cents
        |  FROM lineitem GROUP BY l_orderkey
        |), j AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS stored_cents,
        |    r.recon_cents
        |  FROM orders o JOIN recon r ON r.l_orderkey = o.o_orderkey
        |), dev AS (
        |  SELECT ((recon_cents - stored_cents) * 1000) // stored_cents
        |    AS permille
        |  FROM j)
        |SELECT greatest(least(permille, 1000), -1000) // 250 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(MIN(permille) AS BIGINT) AS min_permille,
        |  CAST(MAX(permille) AS BIGINT) AS max_permille
        |FROM dev GROUP BY 1 ORDER BY bucket""".stripMargin,
    // extends the shared IVF fit/assign replica (MATERIALIZED: cent2 /
    // cnF / norms / assign are each referenced more than once below)
    "sim_query_routing" ->
      (ExtQueries.ivfFitAssignSql(16, 2, 2, mat = true) +
      """, csz AS (
        |  SELECT cell, CAST(COUNT(*) AS BIGINT) AS sz
        |  FROM assign GROUP BY cell
        |), qd AS (
        |  SELECT q.vec_id AS q_id, c.cell, SUM(q.x * c.m) AS dot
        |  FROM ee q JOIN cent2 c ON q.i = c.i
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, c.cell
        |), qr AS (
        |  SELECT qd.q_id, qd.cell,
        |    ROW_NUMBER() OVER (PARTITION BY qd.q_id ORDER BY
        |      ROUND(qd.dot / (nq.nrm * cc.cnrm), 6) DESC, qd.cell)
        |      AS rn
        |  FROM qd
        |  JOIN norms nq ON nq.vec_id = qd.q_id
        |  JOIN cnF cc ON cc.cell = qd.cell
        |), top2 AS (
        |  SELECT q_id,
        |    MIN(CASE WHEN rn = 1 THEN cell END) AS cell_1,
        |    MIN(CASE WHEN rn = 2 THEN cell END) AS cell_2
        |  FROM qr WHERE rn <= 2 GROUP BY q_id)
        |SELECT t.q_id, t.cell_1, t.cell_2,
        |  COALESCE(s1.sz, 0) + COALESCE(s2.sz, 0) AS scanned,
        |  CAST(((COALESCE(s1.sz, 0) + COALESCE(s2.sz, 0)) * 1000000)
        |    // (SELECT COUNT(*) FROM embeddings) AS BIGINT)
        |    AS frac_micro
        |FROM top2 t
        |LEFT JOIN csz s1 ON s1.cell = t.cell_1
        |LEFT JOIN csz s2 ON s2.cell = t.cell_2
        |ORDER BY t.q_id""".stripMargin),
    "ts_mann_kendall" ->
      """WITH d AS (
        |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_day
        |  FROM events
        |  GROUP BY 1
        |), s AS (
        |  SELECT CAST(SUM(CASE WHEN b.v_day > a.v_day THEN 1
        |    WHEN b.v_day < a.v_day THEN -1 ELSE 0 END) AS BIGINT)
        |    AS s_stat
        |  FROM d a JOIN d b ON a.day < b.day
        |), ties AS (
        |  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
        |    AS BIGINT) AS tie_sum
        |  FROM (SELECT COUNT(*) AS t FROM d GROUP BY v_day)
        |), nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM d)
        |SELECT nn.n_days, s.s_stat,
        |  CAST(nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5)
        |    - ties.tie_sum AS BIGINT) AS varnum,
        |  9 * s.s_stat * s.s_stat >
        |    2 * (nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5)
        |      - ties.tie_sum) AS trending
        |FROM s, ties, nn""".stripMargin,
    "text_diversity" ->
      """WITH tok AS (
        |  SELECT source,
        |    lower(unnest(string_split_regex(trim(text), '\s+')))
        |      AS tok
        |  FROM documents
        |), f AS (
        |  SELECT source, tok, COUNT(*) AS f
        |  FROM tok GROUP BY source, tok
        |), g AS (
        |  SELECT source,
        |    CAST(SUM(f) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS vocab,
        |    CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS hapax,
        |    CAST(MAX(f) AS BIGINT) AS max_f,
        |    CAST(SUM(f * (f - 1)) AS BIGINT) AS sq
        |  FROM f GROUP BY source)
        |SELECT source, n_tokens, vocab,
        |  CAST((vocab * 1000000) // n_tokens AS BIGINT) AS ttr_micro,
        |  CAST((sq * 1000000) // (n_tokens * (n_tokens - 1))
        |    AS BIGINT) AS simpson_micro,
        |  CAST((hapax * 1000000) // vocab AS BIGINT) AS hapax_micro,
        |  CAST((max_f * 1000000) // n_tokens AS BIGINT)
        |    AS top_share_micro
        |FROM g ORDER BY source""".stripMargin,
    "tok_bpe_train3" ->
      ("""WITH RECURSIVE words AS (
        |  SELECT w AS word, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
        |      AS w
        |    FROM documents)
        |  WHERE len(w) >= 2 GROUP BY w
        |), w0 AS (
        |  SELECT string_split(word, '') AS s, cnt FROM words
        |)""".stripMargin +
        bpeRoundSql(1, "w0") + bpeRoundSql(2, "w1") +
        bpeRoundSql(3, "w2") +
      """
        |SELECT CAST(1 AS BIGINT) AS round, p1 || '|' || p2 AS pair, n
        |FROM b1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), p1 || '|' || p2, n FROM b2
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), p1 || '|' || p2, n FROM b3
        |ORDER BY round""".stripMargin),
    "embed_outliers" ->
      (ExtQueries.ivfFitAssignSql(16, 2, 2, mat = true) +
      """, own AS (
        |  SELECT vec_id, cell, sim FROM (
        |    SELECT d.vec_id, d.cell,
        |      ROUND(d.dot / (nv.nrm * cc.cnrm), 6) AS sim,
        |      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
        |        ROUND(d.dot / (nv.nrm * cc.cnrm), 6) DESC, d.cell)
        |        AS rn
        |    FROM cdF d
        |    JOIN norms nv ON nv.vec_id = d.vec_id
        |    JOIN cnF cc ON cc.cell = d.cell) z
        |  WHERE rn = 1)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY sim, vec_id) AS INT)
        |    AS "rank",
        |  vec_id, cell, sim
        |FROM own
        |QUALIFY "rank" <= 20
        |ORDER BY "rank"""".stripMargin),
    "eval_ivf_recall" ->
      (ExtQueries.ivfFitAssignSql(16, 2, 2, mat = true) +
      """, dots AS MATERIALIZED (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |    SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), sims AS MATERIALIZED (
        |  SELECT d.q_id, d.n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), exact AS MATERIALIZED (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, n_id) AS rk
        |    FROM sims) z
        |  WHERE rk <= 5
        |), qd AS (
        |  SELECT q.vec_id AS q_id, c.cell, SUM(q.x * c.m) AS dot
        |  FROM ee q JOIN cent2 c ON q.i = c.i
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, c.cell
        |), qr AS MATERIALIZED (
        |  SELECT qd.q_id, qd.cell,
        |    ROW_NUMBER() OVER (PARTITION BY qd.q_id ORDER BY
        |      ROUND(qd.dot / (nq.nrm * cc.cnrm), 6) DESC, qd.cell)
        |      AS probe_rn
        |  FROM qd
        |  JOIN norms nq ON nq.vec_id = qd.q_id
        |  JOIN cnF cc ON cc.cell = qd.cell
        |), np AS (SELECT CAST(nprobe AS BIGINT) AS nprobe
        |          FROM (VALUES (1), (2)) t(nprobe)
        |), ranked AS (
        |  SELECT s.q_id, n.nprobe, s.n_id,
        |    ROW_NUMBER() OVER (PARTITION BY s.q_id, n.nprobe
        |      ORDER BY s.sim DESC, s.n_id) AS rk
        |  FROM sims s
        |  JOIN assign an ON an.vec_id = s.n_id
        |  JOIN qr ON qr.q_id = s.q_id AND qr.cell = an.cell
        |  JOIN np n ON qr.probe_rn <= n.nprobe
        |), hits AS (
        |  SELECT r.q_id, r.nprobe, CAST(COUNT(*) AS BIGINT) AS hits
        |  FROM ranked r
        |  WHERE r.rk <= 5 AND EXISTS (SELECT 1 FROM exact e
        |    WHERE e.q_id = r.q_id AND e.n_id = r.n_id)
        |  GROUP BY r.q_id, r.nprobe)
        |SELECT q.q_id, n.nprobe, COALESCE(h.hits, 0) AS hits,
        |  CAST((COALESCE(h.hits, 0) * 1000000) // 5 AS BIGINT)
        |    AS recall_micro
        |FROM (SELECT vec_id AS q_id FROM embeddings WHERE vec_id < 8) q
        |CROSS JOIN np n
        |LEFT JOIN hits h ON h.q_id = q.q_id AND h.nprobe = n.nprobe
        |ORDER BY q.q_id, n.nprobe""".stripMargin),
    "q67_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, event_id,
        |    epoch_us(ts) AS s,
        |    epoch_us(ts) + CAST(round(value * 1000) AS BIGINT) * 1000
        |      AS e
        |  FROM events
        |), m AS (
        |  SELECT user_id, event_id, s, e,
        |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS runmax
        |  FROM iv
        |), f AS (
        |  SELECT user_id, event_id, s, e,
        |    CASE WHEN runmax IS NULL OR s > runmax THEN 1 ELSE 0 END
        |      AS new_island
        |  FROM m
        |), isl AS (
        |  SELECT user_id, s, e,
        |    SUM(new_island) OVER (PARTITION BY user_id
        |      ORDER BY s, e, event_id ROWS UNBOUNDED PRECEDING)
        |      AS island
        |  FROM f
        |), g AS (
        |  SELECT user_id, island, COUNT(*) AS n_iv,
        |    MIN(s) AS is_, MAX(e) AS ie
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id,
        |  CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(ie - is_) AS BIGINT) AS covered_us,
        |  CAST(MAX(ie) - MIN(is_) AS BIGINT) AS span_us
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_new_vs_returning" ->
      """WITH byday AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day
        |  FROM events
        |), fst AS (
        |  SELECT user_id, MIN(day) AS first_day FROM byday
        |  GROUP BY user_id)
        |SELECT b.day, CAST(COUNT(*) AS BIGINT) AS active,
        |  CAST(SUM(CASE WHEN b.day = f.first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS new_users,
        |  CAST(COUNT(*) - SUM(CASE WHEN b.day = f.first_day
        |    THEN 1 ELSE 0 END) AS BIGINT) AS returning
        |FROM byday b JOIN fst f ON f.user_id = b.user_id
        |GROUP BY b.day ORDER BY b.day""".stripMargin,
    // composes the dedup_minhash_lsh pair oracle and the
    // dedup_clusters labeling oracle verbatim, so the modularity
    // report can never drift from the edges or the partition
    "graph_modularity" ->
      (s"""WITH ed AS (
         |  SELECT id_a, id_b FROM (
         |${ExtQueries.oracle("dedup_minhash_lsh")}
         |) z_ed
         |), cc AS (
         |  SELECT id, cluster FROM (
         |${ExtQueries.oracle("dedup_clusters")}
         |) z_cc
         |)""".stripMargin +
      """, mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ed
        |), deg AS (
        |  SELECT id, COUNT(*) AS d FROM (
        |    SELECT id_a AS id FROM ed UNION ALL
        |    SELECT id_b FROM ed) u
        |  GROUP BY id
        |), dcs AS (
        |  SELECT c.cluster, CAST(COUNT(*) AS BIGINT) AS n_nodes,
        |    CAST(SUM(g.d) AS BIGINT) AS d_c
        |  FROM cc c JOIN deg g ON g.id = c.id GROUP BY c.cluster
        |), ec AS (
        |  SELECT c.cluster, CAST(COUNT(*) AS BIGINT) AS e_c
        |  FROM ed e JOIN cc c ON c.id = e.id_a GROUP BY c.cluster)
        |SELECT d.cluster, d.n_nodes, ec.e_c, d.d_c,
        |  CAST(((4 * mm.m * ec.e_c - d.d_c * d.d_c) * 1000000)
        |    // (4 * mm.m * mm.m) AS BIGINT) AS q_contrib_micro
        |FROM dcs d JOIN ec ON ec.cluster = d.cluster, mm
        |ORDER BY d.cluster""".stripMargin),
    "sim_mmr_rerank" -> mmrSql,
    "mm_tile_grid" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes
        |  FROM documents
        |), rc AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest(
        |      CAST(ceil(n_bytes / 64.0) AS BIGINT), 1))) AS row
        |  FROM m
        |), tiles AS (
        |  SELECT media_id, CAST(row AS BIGINT) AS row,
        |    CAST(col AS BIGINT) AS col,
        |    substring(text, CAST(row * 64 + col * 16 + 1 AS BIGINT),
        |      16) AS tile
        |  FROM rc, UNNEST(range(0, 4)) AS cc(col))
        |SELECT media_id, row, col, md5(tile) AS tile_hash,
        |  CAST(strlen(regexp_replace(tile, '\s', '', 'g')) AS BIGINT)
        |    AS n_ink
        |FROM tiles
        |WHERE strlen(tile) > 0
        |ORDER BY media_id, row, col""".stripMargin,
    "text_prefix_families" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    md5(array_to_string(
        |      string_split_regex(trim(text), '\s+')[1:2], ' '))
        |      AS prefix_hash
        |  FROM documents)
        |SELECT prefix_hash, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS keep_id
        |FROM p GROUP BY prefix_hash
        |HAVING COUNT(*) >= 3
        |ORDER BY prefix_hash""".stripMargin,
    "q68_topk_planned" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS total_cents,
        |  "rank"
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT)
        |      AS "rank"
        |  FROM orders) z
        |WHERE "rank" <= 3
        |ORDER BY o_custkey, "rank"""".stripMargin,
    "dq_referential" -> referentialSql,
    // extends the shared PQ fit/encode replica: a code's own
    // micro-distance IS its quantization distortion
    "embed_pq_distortion" -> (Pq.oracleBase +
      """, dist AS (
        |  SELECT c.m, c.cell, d.dm
        |  FROM codes c
        |  JOIN dall d ON d.vec_id = c.vec_id AND d.m = c.m
        |    AND d.cell = c.cell)
        |SELECT CAST(m AS BIGINT) AS m, CAST(cell AS BIGINT) AS cell,
        |  CAST(COUNT(*) AS BIGINT) AS n_members,
        |  CAST(SUM(dm) // COUNT(*) AS BIGINT) AS mean_d2_micro,
        |  CAST(MAX(dm) AS BIGINT) AS max_d2_micro
        |FROM dist GROUP BY m, cell
        |ORDER BY m, cell""".stripMargin),
    "ev_audience_overlap" ->
      """WITH sets AS (
        |  SELECT DISTINCT event_type, user_id FROM events
        |), sizes AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM sets GROUP BY event_type
        |), both_ AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM sets a JOIN sets b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT w.type_a, w.type_b, sa.n AS n_a, sb.n AS n_b,
        |  w.n_both,
        |  CAST((w.n_both * 1000000) // (sa.n + sb.n - w.n_both)
        |    AS BIGINT) AS jaccard_micro
        |FROM both_ w
        |JOIN sizes sa ON sa.event_type = w.type_a
        |JOIN sizes sb ON sb.event_type = w.type_b
        |ORDER BY w.type_a, w.type_b""".stripMargin,
    "layout_curve_compare" ->
      (s"""WITH RECURSIVE pts AS (
         |  SELECT CAST(o_custkey & 65535 AS BIGINT) AS cust,
         |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate)
         |      & 65535 AS BIGINT) AS day
         |  FROM orders
         |), dpts AS (
         |  SELECT DISTINCT cust AS x0, day AS y0 FROM pts
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
         |  SELECT x0, y0, d FROM hil WHERE s = 0
         |), hb AS (
         |  SELECT hd.d >> 16 AS bucket, p.cust, p.day
         |  FROM pts p JOIN hd ON hd.x0 = p.cust AND hd.y0 = p.day
         |), zb AS (
         |  SELECT (${Ext6Queries.zSql("cust", "day")}) >> 16 AS bucket,
         |    cust, day
         |  FROM pts
         |), perb AS (
         |  SELECT 'hilbert' AS scheme, bucket, COUNT(*) AS n,
         |    (MAX(cust) - MIN(cust) + 1) * (MAX(day) - MIN(day) + 1)
         |      AS area
         |  FROM hb GROUP BY bucket
         |  UNION ALL
         |  SELECT 'morton', bucket, COUNT(*),
         |    (MAX(cust) - MIN(cust) + 1) * (MAX(day) - MIN(day) + 1)
         |  FROM zb GROUP BY bucket)
         |SELECT scheme, CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(SUM(n) AS BIGINT) AS n_rows,
         |  CAST(SUM(area) // COUNT(*) AS BIGINT) AS mean_area,
         |  CAST(MAX(area) AS BIGINT) AS max_area
         |FROM perb GROUP BY scheme ORDER BY scheme""".stripMargin))
}
