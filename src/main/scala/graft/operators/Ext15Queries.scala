package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch: preference queries, non-retractable-aggregate IVM,
  * seeded graph ranking, and symbolic time-series encoding.
  *
  *  - `q69_skyline`: 2-D Pareto frontier (maximize p_size, minimize
  *    p_retailprice) — the classic skyline operator, computed without
  *    any pairwise dominance join: one bounded per-size aggregate +
  *    a suffix-min window over the (≤ |size domain|) size table.
  *  - `cdc_ivm_minmax`: incremental maintenance of a MAX view under
  *    a changelog with retractions. MAX is NOT retractable (deleting
  *    the max carrier invalidates the stored extreme), so the delta
  *    step splits groups into a safe branch (extreme survives,
  *    O(|delta|) adjustment) and a refetch branch (extreme retracted
  *    → recompute that group from stored state, group-pruned).
  *  - `graph_ppr`: personalized PageRank — teleport mass restarts to
  *    a SEED set instead of uniformly, ranking the graph by proximity
  *    to the seeds. Integer micro-units, 3 declared iterations,
  *    all-node frames like graph_pagerank.
  *  - `ts_paa_sax`: piecewise aggregate approximation + SAX lettering
  *    of the per-type daily value series — the standard symbolic
  *    pre-step for motif mining, exact on the integer lattice with
  *    NTILE breakpoints (no gaussian tables, no libm).
  *
  * 100 TB shapes: the skyline touches each row once and joins back a
  * broadcast size-level table (the general scale path replaces the
  * per-size aggregate with range-bucket partial skylines — skyline is
  * decomposable: the frontier of a union is the frontier of the union
  * of partial frontiers); the IVM branches follow the delta except
  * for genuinely refetched groups, each a group-pruned scan of the
  * bucketed state table (the cdc_ivm_topk contract, specialized to
  * the aggregate that cannot buffer its way out); PPR is pagerank's
  * iteration shape with a sparse-frontier note (production keeps only
  * nonzero-rank rows live — mass reaches ≤ frontier∪neighbors per
  * round); PAA/SAX collapses the corpus to (type, day) partials in
  * one aggregate and every window after that runs on the bounded
  * segment lattice.
  */
object Ext15Queries {

  // ---------------------------------------------------------------
  // q69_skyline
  // ---------------------------------------------------------------

  /** Pareto frontier over part: a part survives iff no other part has
    * (size ≥, price ≤) with at least one strict. Rewritten without a
    * dominance self-join:
    *   - within its own size, a survivor must carry the size's min
    *     price (a cheaper same-size part strictly dominates);
    *   - against strictly larger sizes, its price must beat the min
    *     price among ALL larger sizes (suffix-min over the size
    *     table in descending size order — ≤ |sizes| rows).
    * Equal (size, price) twins both survive — dominance needs one
    * strict inequality, so ties are genuine co-frontier points.
    * Prices ride the cent lattice (p_retailprice is 2-decimal by
    * construction), so every comparison is exact integer.
    */
  def skyline(spark: SparkSession, dir: String): DataFrame = {
    val perSize = t(spark, dir, "part")
      .select(col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("price_c"))
      .groupBy("p_size").agg(min("price_c").as("size_min_c"))
    // suffix-min over strictly larger sizes: one row per size, so the
    // preceding frame under a size-desc sort is exactly "all larger"
    val wDesc = Window.orderBy(col("p_size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perSize
      .withColumn("larger_min_c", min("size_min_c").over(wDesc))
    t(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("price_c"))
      .join(broadcast(frontier), Seq("p_size"))
      .filter(col("price_c") === col("size_min_c") &&
        (col("larger_min_c").isNull ||
          col("price_c") < col("larger_min_c")))
      .select(col("p_partkey"), col("p_name"), col("p_size"),
        col("price_c"))
      .orderBy(col("p_size").desc, col("p_partkey"))
  }

  // ---------------------------------------------------------------
  // cdc_ivm_minmax
  // ---------------------------------------------------------------

  /** Incremental maintenance of `GROUP BY event_type → MAX(vm),
    * COUNT(*)` over live last-writer rows, under the catalog's
    * changelog conventions (LWW key = user_id on event_id;
    * event_id % 7 = 0 is an erase; event_id % 5 = 4 is the delta
    * batch). COUNT is retractable and adjusts in place; MAX is not:
    *
    *   safe group    — no retracted row carried the group max →
    *                   max' = greatest(stored max, delta max),
    *                   count' = count − retracted + added;
    *   refetch group — a retracted row tied the stored max (it may
    *                   have been the only carrier) → recompute the
    *                   group from per-key state, semi-join-pruned to
    *                   the refetch groups (bucketed state table →
    *                   partition prune at 100 TB). Groups born in the
    *                   delta (no stored row) take the refetch branch
    *                   too — their "recompute" IS the delta.
    *
    * The oracle recomputes the view from the full history — IVM ==
    * full is the invariant, exactly as cdc_ivm_agg/cdc_ivm_topk.
    */
  def ivmMinMax(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("cast(round(value * 1000) as bigint)").as("vm"),
      (col("event_id") % 7 === 0).as("del"))
    def live(df: DataFrame): DataFrame =
      KeyedMerge.lww(df, Seq("user_id"), "event_id")
        .filter(!col("del"))
    // plan-keyed cache on the LWW result (the cdc_ivm_agg rule): the
    // stored state feeds the view leg, the retract leg AND the
    // refetch leg — uncached, the LWW window would run three times
    val liveBase = live(ev.filter(col("event_id") % 5 =!= 4)).cache()
    val touched = ev.filter(col("event_id") % 5 === 4)
      .select("user_id").distinct()
    val vOld = liveBase.groupBy("event_type")
      .agg(max("vm").as("max_vm"), count(lit(1)).as("n_live"))
    val oldTouched = liveBase
      .join(touched, Seq("user_id"), "left_semi")
    val newTouched = live(ev.join(touched, Seq("user_id"), "left_semi"))
      .cache()
    // a group must refetch iff a retracted row TIES its stored max
    // (ties are conservative: a surviving twin would keep the max,
    // but proving survival costs the same scan the refetch costs)
    val refetchGroups = oldTouched
      .join(vOld.select(col("event_type"), col("max_vm")),
        Seq("event_type"))
      .filter(col("vm") === col("max_vm"))
      .select("event_type").distinct()
      .unionByName(
        // groups born in the delta: no stored row to adjust
        newTouched.select("event_type")
          .join(vOld.select("event_type"), Seq("event_type"),
            "left_anti"))
      .distinct()
    val deltaStats = oldTouched.groupBy("event_type")
      .agg(count(lit(1)).as("n_out"))
      .join(newTouched.groupBy("event_type")
        .agg(max("vm").as("in_max"), count(lit(1)).as("n_in")),
        Seq("event_type"), "full_outer")
    val safe = vOld
      .join(refetchGroups, Seq("event_type"), "left_anti")
      .join(deltaStats, Seq("event_type"), "left")
      .select(col("event_type"),
        (col("n_live") - coalesce(col("n_out"), lit(0L))
          + coalesce(col("n_in"), lit(0L))).as("n_live"),
        greatest(col("max_vm"), coalesce(col("in_max"), col("max_vm")))
          .as("max_vm"))
    val refetch = liveBase.join(touched, Seq("user_id"), "left_anti")
      .unionByName(newTouched)
      .join(refetchGroups, Seq("event_type"), "left_semi")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_live"), max("vm").as("max_vm"))
    safe.unionByName(refetch)
      .filter(col("n_live") > 0)
      .select("event_type", "n_live", "max_vm")
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // graph_ppr
  // ---------------------------------------------------------------

  /** Personalized PageRank over the customer–supplier bipartite graph
    * (graph_pagerank's edge set): teleport mass restarts to the seed
    * set {customer nodes ≡ 0 (mod 50)} instead of uniformly, so rank
    * measures proximity to the seeds. Integer micro-units, 3 declared
    * damped iterations, seed count in-plan via a whole-set window
    * (the lazy-construction contract — no driver-side count). Frames
    * stay all-node like graph_pagerank; a production loop keeps the
    * frontier sparse (only nonzero-rank rows) and checkpoints every
    * few rounds.
    */
  def ppr(spark: SparkSession, dir: String): DataFrame = {
    val scale = 1000000L
    val oneWay = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    // cache(), deliberately: re-read by every iteration's join;
    // CacheManager dedupes by canonicalized plan (graph_pagerank's
    // rule) and bench's between-query clearCache releases it
    val edges = oneWay.select(col("cust").as("src"),
        col("supp").as("dst"))
      .unionAll(oneWay.select(col("supp").as("src"),
        col("cust").as("dst")))
      .cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val seeded = deg
      .withColumn("is_seed",
        col("src") < 1000000L && col("src") % 50 === 0)
      .withColumn("n_seeds",
        sum(when(col("is_seed"), 1L).otherwise(0L))
          .over(Window.partitionBy()))
      .withColumn("seed_micro",
        when(col("is_seed"), expr(s"$scale div n_seeds"))
          .otherwise(0L))
    var ranks = seeded.select(col("src").as("node"), col("deg"),
      col("is_seed"), col("seed_micro"),
      col("seed_micro").as("rank"))
    for (_ <- 1 to 3) {
      val contrib = ranks
        .select(col("node"), expr("rank div deg").as("share"))
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("sum_in"))
      ranks = ranks.drop("rank")
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("deg"), col("is_seed"),
          col("seed_micro"),
          (expr("(15 * seed_micro) div 100") +
            expr("85 * coalesce(sum_in, 0L) div 100")).as("rank"))
    }
    ranks
      .select(col("node"),
        when(col("node") >= 1000000L, "supplier").otherwise("customer")
          .as("kind"),
        col("is_seed"), col("deg"), col("rank").as("rank_micro"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------
  // ts_paa_sax
  // ---------------------------------------------------------------

  /** Segment width (days) for the piecewise aggregate approximation. */
  private val PaaSegDays = 3L

  /** PAA + SAX over the per-type daily value series: collapse events
    * to (type, day) milli-sums, average PaaSegDays-day segments with
    * exact integer floor (values are non-negative — `div` == `//`),
    * then letter each segment by its NTILE(4) quartile bucket within
    * its type (breakpoints from the data itself — the lattice-exact
    * stand-in for SAX's gaussian table, no libm anywhere) and fold
    * the letters into the type's motif word in segment order.
    * Missing (type, day) combos simply shorten their segment's
    * denominator (PAA over observed days — documented contract).
    */
  def paaSax(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum("vm").as("v_day"))
    val segs = daily
      .withColumn("seg", expr(s"day div $PaaSegDays"))
      .groupBy("event_type", "seg")
      .agg(expr("sum(v_day) div count(1)").as("paa_mean"))
    val wNt = Window.partitionBy("event_type")
      .orderBy(col("paa_mean"), col("seg"))
    segs
      .withColumn("nt", ntile(4).over(wNt))
      .withColumn("letter", expr("substr('abcd', nt, 1)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_segs"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("seg"), col("letter")))),
          x => x.getField("letter"))).as("sax_word"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_skyline" -> skyline _,
    "cdc_ivm_minmax" -> ivmMinMax _,
    "graph_ppr" -> ppr _,
    "ts_paa_sax" -> paaSax _,
  )

  def oracle: Map[String, String] = Map(
    "q69_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, p_size,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
        |  FROM part
        |), per_size AS (
        |  SELECT p_size, MIN(price_c) AS size_min_c
        |  FROM p GROUP BY p_size
        |), fr AS (
        |  SELECT p_size, size_min_c,
        |    MIN(size_min_c) OVER (ORDER BY p_size DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS larger_min_c
        |  FROM per_size)
        |SELECT p.p_partkey, p.p_name, p.p_size, p.price_c
        |FROM p JOIN fr USING (p_size)
        |WHERE p.price_c = fr.size_min_c
        |  AND (fr.larger_min_c IS NULL OR p.price_c < fr.larger_min_c)
        |ORDER BY p.p_size DESC, p.p_partkey""".stripMargin,
    "cdc_ivm_minmax" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm,
        |    event_id % 7 = 0 AS del
        |  FROM events
        |), lw AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn
        |  FROM ev
        |), live AS (
        |  SELECT * FROM lw WHERE rn = 1 AND NOT del)
        |SELECT event_type, COUNT(*) AS n_live, MAX(vm) AS max_vm
        |FROM live GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "graph_ppr" ->
      """WITH one AS (
        |  SELECT DISTINCT o.o_custkey AS cust,
        |    l.l_suppkey + 1000000 AS supp
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |), edges AS (
        |  SELECT cust AS src, supp AS dst FROM one
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM one
        |), deg AS (
        |  SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src
        |), sd AS (
        |  SELECT node, deg,
        |    node < 1000000 AND node % 50 = 0 AS is_seed
        |  FROM deg
        |), ns AS (
        |  SELECT COUNT(*) AS n_seeds FROM sd WHERE is_seed
        |), r0 AS (
        |  SELECT node, deg, is_seed,
        |    CASE WHEN is_seed THEN 1000000 // ns.n_seeds ELSE 0 END
        |      AS seed_micro,
        |    CASE WHEN is_seed THEN 1000000 // ns.n_seeds ELSE 0 END
        |      AS rank
        |  FROM sd CROSS JOIN ns
        |), i1 AS (
        |  SELECT d.node, d.deg, d.is_seed, d.seed_micro,
        |    (15 * d.seed_micro) // 100
        |      + (85 * COALESCE(s.sum_in, 0)) // 100 AS rank
        |  FROM r0 d
        |  LEFT JOIN (
        |    SELECT e.dst, CAST(SUM(r.rank // r.deg) AS BIGINT) AS sum_in
        |    FROM r0 r JOIN edges e ON e.src = r.node GROUP BY e.dst
        |  ) s ON s.dst = d.node
        |), i2 AS (
        |  SELECT d.node, d.deg, d.is_seed, d.seed_micro,
        |    (15 * d.seed_micro) // 100
        |      + (85 * COALESCE(s.sum_in, 0)) // 100 AS rank
        |  FROM i1 d
        |  LEFT JOIN (
        |    SELECT e.dst, CAST(SUM(r.rank // r.deg) AS BIGINT) AS sum_in
        |    FROM i1 r JOIN edges e ON e.src = r.node GROUP BY e.dst
        |  ) s ON s.dst = d.node
        |), i3 AS (
        |  SELECT d.node, d.deg, d.is_seed, d.seed_micro,
        |    (15 * d.seed_micro) // 100
        |      + (85 * COALESCE(s.sum_in, 0)) // 100 AS rank
        |  FROM i2 d
        |  LEFT JOIN (
        |    SELECT e.dst, CAST(SUM(r.rank // r.deg) AS BIGINT) AS sum_in
        |    FROM i2 r JOIN edges e ON e.src = r.node GROUP BY e.dst
        |  ) s ON s.dst = d.node)
        |SELECT node,
        |  CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END
        |    AS kind,
        |  is_seed, deg, rank AS rank_micro
        |FROM i3
        |ORDER BY node""".stripMargin,
    "ts_paa_sax" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_day
        |  FROM events GROUP BY 1, 2
        |), segs AS (
        |  SELECT event_type, day // $PaaSegDays AS seg,
        |    CAST(SUM(v_day) // COUNT(*) AS BIGINT) AS paa_mean
        |  FROM daily GROUP BY 1, 2
        |), lettered AS (
        |  SELECT event_type, seg,
        |    substr('abcd', CAST(NTILE(4) OVER (PARTITION BY event_type
        |      ORDER BY paa_mean, seg) AS INT), 1) AS letter
        |  FROM segs)
        |SELECT event_type, COUNT(*) AS n_segs,
        |  string_agg(letter, '' ORDER BY seg) AS sax_word
        |FROM lettered GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
