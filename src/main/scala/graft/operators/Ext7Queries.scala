package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 batch: dataset-export layout operators — deterministic
  * range-partition boundaries (the sampling-free audit of
  * `repartitionByRange`) and the deterministic global shuffle that
  * fixes a training order. Both hash-exact against DuckDB.
  */
object Ext7Queries {

  /** Range-partition boundary audit: exact percentile_disc boundaries
    * (SQL-standard discrete percentiles — bit-identical across
    * engines, verified) split orders into 4 price ranges; emit each
    * range's row count and bounding box. This is the deterministic
    * replacement for `repartitionByRange`'s reservoir sampling when
    * the export must be reproducible: compute boundaries in one exact
    * aggregate (or approx_percentile at 100 TB — same shape), then
    * range-bucket with a broadcast of 3 values. One narrow pass + one
    * 4-group aggregate; the bucketed write is
    * `df.repartition(bucketExpr).sortWithinPartitions(key)`.
    */
  def rangeParts(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    // boundaries as a 1-row CTE cross join, not a construction-time
    // head(): building the DataFrame stays lazy (plan sweeps/audits
    // must not pay an orders scan), and the boundary aggregate is
    // computed inside the same job
    spark.sql(
      """WITH b AS (
        |  SELECT
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
        |      AS b1,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)
        |      AS b2,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)
        |      AS b3
        |  FROM orders)
        |SELECT CASE WHEN o_totalprice <= b.b1 THEN 0
        |            WHEN o_totalprice <= b.b2 THEN 1
        |            WHEN o_totalprice <= b.b3 THEN 2
        |            ELSE 3 END AS part,
        |  COUNT(*) AS n_orders,
        |  MIN(o_totalprice) AS price_min,
        |  MAX(o_totalprice) AS price_max
        |FROM orders, b
        |GROUP BY 1
        |ORDER BY part""".stripMargin)
  }

  /** Deterministic global shuffle: the md5-keyed permutation that
    * fixes a reproducible training order. Each document gets a shard
    * (hash-split, re-shardable) and a position within its shard
    * (rank by hash) — together a total order that any number of
    * readers can reconstruct with no coordination. The within-shard
    * rank is the only sort, and it is partitioned by shard — at
    * 100 TB each shard sorts independently (vs a global orderBy's
    * single range-partitioned sort).
    */
  def shuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("shuf:"), col("doc_id")))
    t(spark, dir, "documents")
      .select(col("doc_id"), h.as("h"),
        (conv(substring(h, 1, 2), 16, 10).cast("long") % 8).as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"),
          col("doc_id"))))
      .select(col("shard"), col("pos").cast("long").as("pos"),
        col("doc_id"), col("h"))
      .orderBy("shard", "pos")
  }

  /** Per-node triangle counts of an undirected graph given as (a, b)
    * pairs with a < b — DEGREE-ORDERED enumeration: every edge is
    * oriented from its lower-(degree, id) endpoint to the higher one,
    * wedges open at each node's out-neighbours, and a wedge closes
    * along an oriented edge. Each triangle is therefore found exactly
    * once, from its lowest-degree corner, and the self-join fan-out
    * per node is bounded by the ORIENTED out-degree — which degree
    * ordering caps at O(sqrt(m)) even on a power-law graph: a hub's
    * edges all point INTO it, so the hub contributes no wedges at all
    * (the skew fix the round-3 comment promised; TriangleSkewSpec
    * proves the bound on a hub graph).
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // ties in degree fall back to id order, so the a < b input
    // orientation is kept when degrees are equal. `dk` carries the
    // destination's (degree, id) sort key: struct ordering gives the
    // total order that both picks each wedge once AND matches the
    // closing edge's orientation (no OR-of-two-orientations join).
    //
    // cache(), deliberately: the oriented edge list is referenced
    // three times by the joins; CacheManager keys entries by
    // canonicalized plan, so repeated constructions reuse ONE entry
    // (no accumulation) and bench's between-query clearCache releases
    // it. A lazy localCheckpoint re-materialized the banded pair
    // search per construction — measured slower at sf1.
    val e = pairs
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b"))
          .as("src"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a"))
          .as("dst"),
        when(col("da") <= col("db"),
            struct(col("db").as("kd"), col("b").as("ki")))
          .otherwise(struct(col("da").as("kd"), col("a").as("ki")))
          .as("dk"))
      .cache()
    val tri = e.as("e1")
      .join(e.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dk") < col("e2.dk"))
      .join(e.as("e3"),
        col("e3.src") === col("e1.dst") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy("node")
  }

  /** Near-dup graph triangle audit: per-node triangle counts over the
    * simhash Hamming-pair graph — the density diagnostic that tells a
    * dedup pipeline whether its near-dup clusters are tight cliques
    * (safe to collapse to one canonical doc) or loose chains
    * (transitive merging would over-delete).
    */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame =
    // maxHamming=5 (6 bands of 10 bits on the 60-bit fingerprint): at
    // distance 3 the wide fingerprint leaves the synthetic corpus with
    // pairs only (no 3-cliques); 5 keeps the triangle structure the
    // audit exists to measure while the candidate join stays
    // collision-bounded
    triangleCounts(
      NearDupGraph.simhashPairs5(spark, dir)
        .select(col("id_a").as("a"), col("id_b").as("b")))

  /** Hybrid near-dup verification: lexical MinHash-LSH candidates
    * re-scored by embedding cosine — the two-stage shape real dedup
    * pipelines use (cheap lexical banding finds candidates, the
    * semantic space decides). The embedding join is two hash joins on
    * the pair ids against the (id -> vector, norm) table; candidate
    * count is LSH-bounded, so the expensive cosine only ever runs on
    * collisions, never all pairs. Disagreement between the two
    * signals (high Jaccard, low cosine) is exactly what this query
    * surfaces.
    */
  def hybridVerify(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.lshPairs(spark, dir)
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("vec"))
      .withColumn("nrm", Similarity.norm(col("vec")))
    val a = emb.select(col("vec_id").as("id_a"), col("vec").as("va"),
      col("nrm").as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("vec").as("vb"),
      col("nrm").as("nb"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("cosine", round(
        Similarity.dot(col("va"), col("vb"))
          / (col("na") * col("nb")), 6))
      .select(col("id_a"), col("id_b"),
        round(col("jaccard"), 6).as("jaccard"), col("cosine"),
        (col("cosine") >= 0.2).as("semantic_agree"))
      .orderBy("id_a", "id_b")
  }

  /** Higher-order array functions (lambda expressions inside
    * whole-stage codegen — the Spark-native way to process nested
    * data without exploding it): filter / forall / aggregate over the
    * token array, all in one narrow projection. No shuffle at all
    * until the presentation sort.
    */
  def higherOrder(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        size(filter(col("tk"), x => length(x) > 4)).cast("long")
          .as("n_long"),
        aggregate(col("tk"), lit(0L), (acc, x) => acc + length(x))
          .as("total_chars"),
        array_contains(col("tk"), "spark").as("has_spark"),
        forall(col("tk"), x => length(x) < 12).as("all_short"))
      .orderBy("doc_id")

  /** OHLC bars: per (event_type, day) open/high/low/close from the
    * event stream — the time-series downsampling shape. Open/close
    * are arg-min/arg-max over a TRULY injective order key: within a
    * bar only intra-day ordering matters, so
    * `(us - epoch2024 - day·86400e6)·2^26 + event_id` fits a long
    * (37 time bits + 26 id bits) and embeds the FULL event id — a
    * timestamp tie can
    * never make the bar engine-dependent (the first draft's
    * `event_id mod 4096` could collide). One hash aggregate, no
    * window, no sort until presentation.
    *
    * PRECONDITION (enforced): event_id < 2^26 (~67M). Beyond that the
    * id bits overflow into the time bits, colliding ord values would
    * make min_by/max_by ties partition-order-dependent — and the
    * oracle, using the identical formula, could NOT catch the
    * within-Spark nondeterminism. assert_true fails the query loudly
    * instead; a wider corpus should widen the shift (id fits 2^b,
    * time gets 63-b bits).
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .filter(isnull(expr(
        "assert_true(event_id < 67108864, " +
          "'ohlcBars ord key requires event_id < 2^26')")))
      .select(col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("""((ts div 1000) - 1704067200000000L -
            datediff(timestamp_micros(ts div 1000), date'2024-01-01')
              * 86400000000L) * 67108864L + event_id""").as("ord"),
        round(col("value") * 1000).cast("long").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("vm"), col("ord")).as("open_vm"),
        max(col("vm")).as("high_vm"),
        min(col("vm")).as("low_vm"),
        max_by(col("vm"), col("ord")).as("close_vm"))
      .orderBy("event_type", "day")

  /** Running distinct users: each user charged to their first-seen
    * day, then a cumulative sum over days — the exact running-uniques
    * curve computed with ONE aggregate per user plus a days-sized
    * window (never a per-day distinct over growing prefixes, which is
    * O(days · users) and the classic naive trap). At 100 TB the
    * first-seen aggregate is the only large shuffle; the cumsum runs
    * on |days| rows.
    */
  def runningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = t(spark, dir, "events")
      .select(col("user_id"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"))
    firstSeen.groupBy(col("first_day"))
      .agg(count(lit(1)).as("n_new"))
      // bounded domain: one row per first-seen DAY (horizon-bounded)
      .withColumn("cum_users", sum(col("n_new")).over(
        Window.orderBy(col("first_day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("first_day")
  }

  /** Per-group Pearson correlation from integer moments: the five
    * sums (x, y, xx, yy, xy) stay BIGINT — order-independent under
    * any partitioning — and only the final closed-form expression
    * touches doubles (identical text both engines, rounded to 1e-6).
    * The portable way to ship statistical aggregates: never sum
    * doubles across partitions. Value is quantized to whole units so
    * n·sxx stays within BIGINT at bench scale.
    */
  def corrMoments(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_type"),
        round(col("value")).cast("long").as("x"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("corr_r6", expr(
        """round(CAST(n * sxy - sx * sy AS DOUBLE)
          | / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
          |    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)"""
          .stripMargin))
      .select("event_type", "n", "sx", "sy", "sxx", "syy", "sxy",
        "corr_r6")
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_rangeparts" -> rangeParts _,
    "text_shuffle_shards" -> shuffleShards _,
    "graph_triangles" -> graphTriangles _,
    "dedup_hybrid_verify" -> hybridVerify _,
    "q48_higher_order" -> higherOrder _,
    "q49_ohlc_bars" -> ohlcBars _,
    "q50_running_distinct" -> runningDistinct _,
    "q51_corr_moments" -> corrMoments _,
    "q52_group_percentiles" -> groupPercentiles _,
    "q53_approx_topk" -> approxTopK _)

  /** Frequent-items sketch (Spark 4 approx_top_k): top-10 suppliers
    * by lineitem row count. Below the tracked-items capacity the
    * sketch is EXACT, which gives the oracle a real contract (the
    * same testable-approximation pattern as q23_approx_distinct); at
    * 100 TB cardinalities the same one-pass mergeable sketch degrades
    * gracefully instead of paying an exact global count per item.
    * The sketch tracks 50 candidates and the deterministic
    * (count desc, item) re-rank cuts to 10 AFTER — a count tie at the
    * k boundary would otherwise make the sketch's own candidate pick
    * engine-ambiguous (observed at rank 9/10 on sf0.01).
    */
  def approxTopK(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """WITH sk AS (
        |  SELECT explode(approx_top_k(l_suppkey, 50, 10000)) AS e
        |  FROM lineitem
        |), ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY e.count DESC, e.item)
        |      AS INT) AS rnk,
        |    e.item AS suppkey, e.count AS cnt
        |  FROM sk)
        |SELECT rnk, suppkey, cnt FROM ranked
        |WHERE rnk <= 10
        |ORDER BY rnk""".stripMargin)
  }

  /** Per-group latency-style percentiles (p50/p90/p99 of the event
    * value per type) via SQL-standard percentile_disc — discrete
    * percentiles pick actual data values, verified bit-identical
    * across engines (no interpolation arithmetic to disagree on).
    * One sort per group partition; at 100 TB swap in approx_percentile
    * for a single-pass sketch with the same output shape.
    */
  def groupPercentiles(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS p90,
        |  percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  val oracle: Map[String, String] = Map(
    "q53_approx_topk" ->
      """WITH c AS (
        |  SELECT l_suppkey AS suppkey, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_suppkey)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, suppkey)
        |    AS INT) AS rnk,
        |  suppkey, cnt
        |FROM c
        |ORDER BY rnk
        |LIMIT 10""".stripMargin,
    "q52_group_percentiles" ->
      """SELECT event_type, COUNT(*) AS n,
        |  quantile_disc(value, 0.5) AS p50,
        |  quantile_disc(value, 0.9) AS p90,
        |  quantile_disc(value, 0.99) AS p99
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q49_ohlc_bars" ->
      """WITH e AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS day,
        |    (epoch_us(ts) - 1704067200000000
        |      - date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |        * 86400000000) * 67108864 + event_id AS ord,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events)
        |SELECT event_type, day, COUNT(*) AS n_events,
        |  arg_min(vm, ord) AS open_vm,
        |  MAX(vm) AS high_vm,
        |  MIN(vm) AS low_vm,
        |  arg_max(vm, ord) AS close_vm
        |FROM e
        |GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,
    "q50_running_distinct" ->
      """WITH fs AS (
        |  SELECT user_id,
        |    MIN(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)))
        |      AS first_day
        |  FROM events GROUP BY user_id
        |), byday AS (
        |  SELECT first_day, COUNT(*) AS n_new FROM fs
        |  GROUP BY first_day)
        |SELECT first_day, n_new,
        |  CAST(SUM(n_new) OVER (ORDER BY first_day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_users
        |FROM byday
        |ORDER BY first_day""".stripMargin,
    "q51_corr_moments" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(round(value) AS BIGINT) AS x,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
        |  FROM events
        |), m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(y * y) AS BIGINT) AS syy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM e GROUP BY event_type)
        |SELECT event_type, n, sx, sy, sxx, syy, sxy,
        |  round(CAST(n * sxy - sx * sy AS DOUBLE)
        |   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |      * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
        |    AS corr_r6
        |FROM m
        |ORDER BY event_type""".stripMargin,
    "layout_rangeparts" ->
      """WITH b AS (
        |  SELECT quantile_disc(o_totalprice, 0.25) AS b1,
        |    quantile_disc(o_totalprice, 0.5) AS b2,
        |    quantile_disc(o_totalprice, 0.75) AS b3
        |  FROM orders)
        |SELECT CASE WHEN o_totalprice <= b.b1 THEN 0
        |            WHEN o_totalprice <= b.b2 THEN 1
        |            WHEN o_totalprice <= b.b3 THEN 2
        |            ELSE 3 END AS part,
        |  COUNT(*) AS n_orders,
        |  MIN(o_totalprice) AS price_min,
        |  MAX(o_totalprice) AS price_max
        |FROM orders, b
        |GROUP BY 1
        |ORDER BY part""".stripMargin,
    "q48_higher_order" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_tok,
        |  CAST(len(list_filter(tk, x -> len(x) > 4)) AS BIGINT)
        |    AS n_long,
        |  CAST(list_sum(list_transform(tk, x -> len(x))) AS BIGINT)
        |    AS total_chars,
        |  list_contains(tk, 'spark') AS has_spark,
        |  len(list_filter(tk, x -> len(x) >= 12)) = 0 AS all_short
        |FROM toks
        |ORDER BY doc_id""".stripMargin,
    "dedup_hybrid_verify" ->
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
        |), sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |common AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS common
        |  FROM cands c
        |  JOIN sh a ON a.id = c.id_a
        |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY c.id_a, c.id_b
        |), pairs AS (
        |  SELECT id_a, id_b,
        |    CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common
        |      AS DOUBLE) AS jaccard
        |  FROM common
        |  JOIN sizes sa ON sa.id = id_a
        |  JOIN sizes sb ON sb.id = id_b
        |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common
        |      AS DOUBLE) >= 0.1
        |), ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), cos AS (
        |  SELECT p.id_a, p.id_b, p.jaccard,
        |    ROUND(SUM(a.x * b.x) / (na.nrm * nb.nrm), 6) AS cosine
        |  FROM pairs p
        |  JOIN ee a ON a.vec_id = p.id_a
        |  JOIN ee b ON b.vec_id = p.id_b AND b.i = a.i
        |  JOIN norms na ON na.vec_id = p.id_a
        |  JOIN norms nb ON nb.vec_id = p.id_b
        |  GROUP BY p.id_a, p.id_b, p.jaccard, na.nrm, nb.nrm)
        |SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard, cosine,
        |  cosine >= 0.2 AS semantic_agree
        |FROM cos
        |ORDER BY id_a, id_b""".stripMargin,
    "graph_triangles" ->
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
        |), tri AS (
        |  SELECT e1.a, e1.b, e2.b AS c
        |  FROM pairs e1
        |  JOIN pairs e2 ON e2.a = e1.b
        |  JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT node, COUNT(*) AS n_triangles
        |FROM (SELECT a AS node FROM tri UNION ALL
        |      SELECT b FROM tri UNION ALL
        |      SELECT c FROM tri)
        |GROUP BY node
        |ORDER BY node""".stripMargin,
    "text_shuffle_shards" ->
      """WITH h AS (
        |  SELECT doc_id, md5('shuf:' || doc_id) AS h
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, h,
        |    CAST((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
        |      AS BIGINT) % 8 AS shard
        |  FROM h)
        |SELECT shard,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY shard
        |    ORDER BY h, doc_id) AS BIGINT) AS pos,
        |  doc_id, h
        |FROM s
        |ORDER BY shard, pos""".stripMargin)
}
