package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 extension queries: TF-IDF keyword extraction, cross-document
  * repeated-substring signal, PII redaction, epoch-weighted mixture
  * sampling, and Bloom-filter decontamination — each backed by the
  * operator library and a hash-exact DuckDB oracle.
  */
object Ext2Queries {

  /** Top-3 TF-IDF terms per document. */
  def tfidf(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(t(spark, dir, "documents"), "doc_id", "text",
        k = 3)
      .orderBy("doc_id", "rank")

  /** Fraction of each document's token 8-grams that also occur in at
    * least one other document (distributed stand-in for suffix-array
    * substring dedup).
    */
  def dupNgrams(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dupNgramStats(t(spark, dir, "documents"), "doc_id",
        "text", n = 8)
      .orderBy("doc_id")

  /** PII redaction over text augmented with deterministic synthetic
    * PII (the fixture corpus contains none): every doc gains one
    * email + phone + IPv4, docs with doc_id % 3 == 0 gain a second
    * email. Counts + the redacted text's md5 are oracle-checked.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    val aug = concat(col("text"),
      lit(" contact user"), d.cast("string"), lit("@example.com"),
      when(d % 3 === 0, lit(" cc bob@test.org")).otherwise(lit("")),
      lit(" call +1-555-"), lpad((d % 10000).cast("string"), 4, "0"),
      lit(" from "), (d % 223 + 1).cast("string"), lit("."),
      ((d * 7) % 256).cast("string"), lit("."),
      ((d * 13) % 256).cast("string"), lit("."),
      ((d * 29) % 251).cast("string"))
    TextAnalysis.piiRedact(
        t(spark, dir, "documents").withColumn("aug", aug),
        "doc_id", "aug")
      .orderBy("doc_id")
  }

  /** Epoch-weighted mixture: sources 0-4 train 3 epochs, 5-9 train 2,
    * the rest 1 — deterministic replication with a per-replica mix key.
    */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame = {
    val srcNum = substring(col("source"), 4, 10).cast("int")
    val epochs = when(srcNum < 5, 3).when(srcNum < 10, 2).otherwise(1)
    TextAnalysis.mixEpochs(t(spark, dir, "documents"), "doc_id",
        "source", epochs)
      .select("doc_id", "source", "epoch", "mix_key")
      .orderBy("doc_id", "epoch")
  }

  /** Bloom-filter decontamination vs the eval set (docs 0-9): m = 2^18
    * bits, k = 2 md5-derived hashes — flags (including any false
    * positives) are deterministic and engine-portable.
    */
  def bloomDecon(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.bloomContaminationFlags(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 10), n = 5, mBits = 1L << 18,
        kHashes = 2)
      .select(col("id").as("doc_id"), col("bloom_hit"),
        col("exact_hit"), col("false_pos"))
      .orderBy("doc_id")
  }

  /** RANGE-frame window: per-customer trailing-90-day order count and
    * spend (frame bounded by the ORDER BY value, not row offsets — the
    * sliding-time-window analytics shape). Money summed as exact
    * DECIMAL inside the frame so segment-tree vs running-sum window
    * implementations cannot produce FP-order noise.
    */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate"), lit("1970-01-01"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-89, 0)
    t(spark, dir, "orders")
      .filter(col("o_custkey") % 10 === 0)
      .withColumn("day", day.cast("long"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("spend_trailing",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
          .cast("double"))
      .select("o_custkey", "o_orderkey", "day", "n_trailing",
        "spend_trailing")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** TPC-H Q17-shaped correlated SCALAR subqueries through `spark.sql`
    * — Catalyst must decorrelate both per-part aggregates into joins
    * (complementing q32's EXISTS/NOT EXISTS decorrelation). The
    * small-quantity threshold is expressed multiplicatively
    * (qty · 5 · cnt < sum) so the comparison is exact decimal
    * arithmetic with no division on either engine.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT l.l_partkey,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_qty_sum,
        |  COUNT(*) AS n_small
        |FROM lineitem l
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
        |    (SELECT COUNT(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |  < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
        |     FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)
        |GROUP BY l.l_partkey
        |ORDER BY l.l_partkey""".stripMargin)
  }

  /** Multiplicity-preserving set operations (INTERSECT ALL / EXCEPT
    * ALL — Catalyst rewrites them to generate+replicate plans, unlike
    * q7's distinct variants): per-customer overlap of urgent vs high
    * priority order multiplicities.
    */
  def setopsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val high = o.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_custkey"))
    val inter = urgent.intersectAll(high)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_inter"))
    val minus = urgent.exceptAll(high)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_minus"))
    inter.join(minus, Seq("o_custkey"), "full_outer")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_minus", coalesce(col("n_minus"), lit(0L)))
      .orderBy("o_custkey")
  }

  /** UNPIVOT (melt) — the inverse of q15's pivot: wide per-status
    * order metrics fold into (status, metric, value) long form via the
    * native `unpivot` operator (an Expand node, no shuffle beyond the
    * feeding aggregate).
    */
  def unpivotQ(spark: SparkSession, dir: String): DataFrame = {
    val wide = t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_price"),
        countDistinct(col("o_custkey")).cast("double").as("n_customers"))
    wide.unpivot(
        Array(col("o_orderstatus")),
        Array(col("n_orders"), col("total_price"), col("n_customers")),
        "metric", "value")
      .orderBy("o_orderstatus", "metric")
  }

  /** GPT-style sequence packing: 256-token bins over the hash-ordered
    * token stream (distributed prefix sum via hash-prefix buckets).
    */
  def packSeqs(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.packSequences(t(spark, dir, "documents"), "doc_id",
        "text", budget = 256)
      .orderBy("doc_id")

  /** Time-series resample + forward fill: each user's event stream is
    * regularized onto an hourly grid (per-user min..max hour via
    * `sequence`), hours with no events carry the last observed value
    * forward (`last(..., ignoreNulls)` over an ordered window). The
    * gap-fill shape every metrics/feature pipeline needs; grid
    * generation is a narrow explode, the fill is one window over the
    * per-user timeline.
    */
  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("user_id") % 10 === 0)
      .select(col("user_id"),
        date_trunc("hour", graft.Tables.eventsTsMicros).as("hr"),
        round(col("value") * 1000).cast("long").as("vm"))
    val hourly = ev.groupBy("user_id", "hr")
      .agg(count(lit(1)).as("n"), max(col("vm")).as("vm_hr"))
    val grid = ev.groupBy("user_id")
      .agg(min(col("hr")).as("hr0"), max(col("hr")).as("hr1"))
      .select(col("user_id"), explode(sequence(col("hr0"), col("hr1"),
        expr("interval 1 hour"))).as("hr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hr")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("vm_ff", last(col("vm_hr"), ignoreNulls = true).over(w))
      .select("user_id", "hr", "n", "vm_ff")
      .orderBy("user_id", "hr")
  }

  /** Semi-structured access through Spark 4's VARIANT type: the CDC
    * envelope JSON is parsed ONCE into a variant (binary-encoded,
    * shredded access — the modern replacement for repeated
    * get_json_object string re-parses), fields are extracted with typed
    * `variant_get` paths, and the per-op aggregate proves the routing.
    * Missing paths yield NULL via `try_variant_get`, never an error.
    */
  def variantJson(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val env = concat(lit("{\"key\":["), col("user_id").cast("string"),
      lit("],\"update\":{\"user_id\":"), col("user_id").cast("string"),
      lit(",\"event_type\":\""), col("event_type"),
      lit("\",\"value_milli\":"),
      round(col("value") * 1000).cast("long").cast("string"),
      lit("}}"))
    ev.select(col("event_id"), parse_json(env).as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.key[0]", "bigint").as("user_id"),
        variant_get(col("v"), "$.update.event_type", "string")
          .as("event_type"),
        variant_get(col("v"), "$.update.value_milli", "bigint")
          .as("value_milli"),
        try_variant_get(col("v"), "$.update.missing_field", "bigint")
          .as("absent"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value_milli")).as("sum_vm"),
        max(col("user_id")).as("max_uid"),
        sum(when(col("absent").isNull, 1L).otherwise(0L))
          .as("n_absent"))
      .orderBy(col("event_type"))
  }

  /** Mergeable-sketch distinct counting (DataSketches HLL, native in
    * Spark 4): one HLL sketch of distinct 5-gram shingles PER SOURCE,
    * merged with `hll_union_agg` into the corpus-wide estimate — the
    * re-aggregatable rollup pattern that makes 100 TB distinct counts
    * cheap (partial sketches per partition/day, merged later, never
    * re-scanned). Exact distinct counts are emitted for the hash gate;
    * the estimates are checked by a q23-style within-5% contract
    * (sketches are deterministic for a given item multiset, but not
    * DuckDB-replayable).
    */
  def sketchShingles(spark: SparkSession, dir: String): DataFrame = {
    val sh5 = t(spark, dir, "documents")
      .select(col("source"), explode(array_distinct(
        Dedup.shingleArray(col("text"), 5))).as("shingle"))
    val per = sh5.groupBy("source").agg(
      hll_sketch_agg(col("shingle")).as("sk"),
      countDistinct(col("shingle")).as("n_exact"))
    val perOut = per.select(col("source"), col("n_exact"),
      hll_sketch_estimate(col("sk")).as("est"))
    val allExact = sh5.agg(countDistinct(col("shingle")).as("n_exact"))
    val allOut = per.agg(hll_union_agg(col("sk")).as("sk"))
      .crossJoin(broadcast(allExact))
      .select(lit("ALL").as("source"), col("n_exact"),
        hll_sketch_estimate(col("sk")).as("est"))
    perOut.unionByName(allOut)
      .withColumn("hll_ok",
        abs(col("est") - col("n_exact").cast("double"))
          <= col("n_exact").cast("double") * 0.05)
      .select("source", "n_exact", "hll_ok")
      .orderBy("source")
  }

  /** Theta-sketch set operations: distinct-shingle overlap between two
    * source halves via `theta_intersection` vs the exact intersection
    * — sketch set algebra is how cross-dataset contamination overlap
    * is estimated without a join at 100 TB.
    */
  def sketchOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sh5 = t(spark, dir, "documents")
      .select(col("source"), explode(array_distinct(
        Dedup.shingleArray(col("text"), 5))).as("shingle"))
      .withColumn("grp",
        when(substring(col("source"), 4, 10).cast("int") < 10, "a")
          .otherwise("b"))
    val sk = sh5.groupBy("grp").agg(
      theta_sketch_agg(col("shingle")).as("sk"))
    val inter = sk.agg(theta_sketch_estimate(
      theta_intersection_agg(col("sk"))).as("est_inter"))
    val exact = sh5.select(col("grp"), col("shingle")).distinct()
      .groupBy(col("shingle")).agg(count(lit(1)).as("ng"))
      .agg(sum(when(col("ng") === 2, 1L).otherwise(0L))
        .as("n_exact_inter"),
        count(lit(1)).as("n_exact_union"))
    exact.crossJoin(broadcast(inter))
      .withColumn("inter_ok",
        abs(col("est_inter") - col("n_exact_inter").cast("double"))
          <= col("n_exact_inter").cast("double") * 0.10)
      .select("n_exact_inter", "n_exact_union", "inter_ok")
  }

  /** Snapshot-diff changelog generation (the inverse of the apply
    * path): two per-user snapshots derived from disjoint event halves
    * are diffed into insert/update/erase ops — how a changefeed is
    * bootstrapped from periodic table snapshots.
    */
  def diffChangelog(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def snap(cond: org.apache.spark.sql.Column) =
      ev.filter(cond).groupBy(col("user_id"))
        .agg(max(col("event_type")).as("event_type"),
          max(round(col("value") * 1000).cast("long")).as("value_milli"))
    KeyedMerge.diffChangelog(
        snap(col("event_id") % 2 === 0), snap(col("event_id") % 2 === 1),
        Seq("user_id"))
      .orderBy("user_id")
  }

  /** Substring-dedup transform: mask every token covered by a
    * cross-document duplicated 8-gram, re-assemble the survivors.
    */
  def dedupSpans(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dedupSpans(t(spark, dir, "documents"), "doc_id",
        "text", n = 8)
      .select("doc_id", "n_tokens", "n_kept", "n_removed", "kept_md5")
      .orderBy("doc_id")

  /** Mean unigram NLL per document under the corpus unigram LM. */
  def unigramNll(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogprob(t(spark, dir, "documents"), "doc_id",
        "text")
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_range_frame" -> rangeFrame _,
    "q34_scalar_subquery" -> scalarSubquery _,
    "cdc_diff_changelog" -> diffChangelog _,
    "text_sketch_shingles" -> sketchShingles _,
    "text_sketch_overlap" -> sketchOverlap _,
    "q35_variant_json" -> variantJson _,
    "q36_resample_ffill" -> resampleFfill _,
    "text_pack_sequences" -> packSeqs _,
    "q37_unpivot" -> unpivotQ _,
    "q38_setops_all" -> setopsAll _,
    "text_dedup_spans" -> dedupSpans _,
    "text_unigram_nll" -> unigramNll _,
    "text_tfidf" -> tfidf _,
    "text_dup_ngrams" -> dupNgrams _,
    "text_pii_redact" -> piiRedact _,
    "text_mix_epochs" -> mixEpochs _,
    "text_bloom_decontaminate" -> bloomDecon _)

  val oracle: Map[String, String] = Map(
    "q33_range_frame" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
        |      AS day,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT o_custkey, o_orderkey, day,
        |  COUNT(*) OVER w AS n_trailing,
        |  CAST(SUM(price) OVER w AS DOUBLE) AS spend_trailing
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 89 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q34_scalar_subquery" ->
      """SELECT l.l_partkey,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS small_qty_sum,
        |  COUNT(*) AS n_small
        |FROM lineitem l
        |WHERE CAST(l.l_quantity AS DECIMAL(18,2)) * 5 *
        |    (SELECT COUNT(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l.l_partkey)
        |  < (SELECT SUM(CAST(l3.l_quantity AS DECIMAL(18,2)))
        |     FROM lineitem l3 WHERE l3.l_partkey = l.l_partkey)
        |GROUP BY l.l_partkey
        |ORDER BY l.l_partkey""".stripMargin,
    "q38_setops_all" ->
      """WITH urgent AS (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |), high AS (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
        |), inter AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_inter FROM
        |    (SELECT o_custkey FROM urgent
        |     INTERSECT ALL SELECT o_custkey FROM high)
        |  GROUP BY o_custkey
        |), minus AS (
        |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_minus FROM
        |    (SELECT o_custkey FROM urgent
        |     EXCEPT ALL SELECT o_custkey FROM high)
        |  GROUP BY o_custkey)
        |SELECT coalesce(i.o_custkey, m.o_custkey) AS o_custkey,
        |  coalesce(i.n_inter, 0) AS n_inter,
        |  coalesce(m.n_minus, 0) AS n_minus
        |FROM inter i FULL OUTER JOIN minus m ON m.o_custkey = i.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "q37_unpivot" ->
      """WITH wide AS (
        |  SELECT o_orderstatus,
        |    CAST(COUNT(*) AS DOUBLE) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price,
        |    CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS n_customers
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, metric, value FROM (
        |  SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value
        |  FROM wide
        |  UNION ALL
        |  SELECT o_orderstatus, 'total_price', total_price FROM wide
        |  UNION ALL
        |  SELECT o_orderstatus, 'n_customers', n_customers FROM wide)
        |ORDER BY o_orderstatus, metric""".stripMargin,
    "text_pack_sequences" ->
      """WITH base AS (
        |  SELECT doc_id, md5(text) AS key,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), cum AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY key, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS BIGINT) AS start_off
        |  FROM base)
        |SELECT doc_id, n_tokens, start_off,
        |  CAST(floor(start_off / 256) AS BIGINT) AS bin_start,
        |  CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 256)
        |    AS BIGINT) AS bin_end,
        |  CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 256)
        |    - floor(start_off / 256) + 1 AS BIGINT) AS n_bins
        |FROM cum ORDER BY doc_id""".stripMargin,
    "q36_resample_ffill" ->
      """WITH ev AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |    CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |  FROM events WHERE user_id % 10 = 0
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
        |    UNNEST(generate_series(hr0, hr1, INTERVAL 1 HOUR)) AS g(hr))
        |SELECT g.user_id, g.hr, coalesce(h.n, 0) AS n,
        |  LAST_VALUE(h.vm_hr IGNORE NULLS) OVER
        |    (PARTITION BY g.user_id ORDER BY g.hr
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vm_ff
        |FROM grid g LEFT JOIN hourly h
        |  ON h.user_id = g.user_id AND h.hr = g.hr
        |ORDER BY g.user_id, g.hr""".stripMargin,
    "q35_variant_json" ->
      """WITH env AS (
        |  SELECT event_id,
        |    '{"key":[' || user_id || '],"update":{"user_id":' || user_id
        |      || ',"event_type":"' || event_type || '","value_milli":'
        |      || CAST(ROUND(value * 1000) AS BIGINT) || '}}' AS env
        |  FROM events)
        |SELECT json_extract_string(env, '$.update.event_type') AS event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(json_extract_string(env, '$.update.value_milli')
        |    AS BIGINT)) AS BIGINT) AS sum_vm,
        |  CAST(MAX(CAST(json_extract_string(env, '$.key[0]') AS BIGINT))
        |    AS BIGINT) AS max_uid,
        |  CAST(count(*) AS BIGINT) AS n_absent
        |FROM env GROUP BY event_type ORDER BY event_type""".stripMargin,
    "text_sketch_shingles" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT source,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |      tk[i+3] || ' ' || tk[i+4] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 3, 1))) AS r(i)
        |), per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
        |    true AS hll_ok
        |  FROM sh GROUP BY source
        |), allr AS (
        |  SELECT 'ALL' AS source,
        |    CAST(count(DISTINCT shingle) AS BIGINT) AS n_exact,
        |    true AS hll_ok
        |  FROM sh)
        |SELECT * FROM per UNION ALL SELECT * FROM allr
        |ORDER BY source""".stripMargin,
    "text_sketch_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT
        |    CASE WHEN CAST(substr(source, 4) AS INT) < 10
        |      THEN 'a' ELSE 'b' END AS grp,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |      tk[i+3] || ' ' || tk[i+4] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 3, 1))) AS r(i)
        |), g AS (
        |  SELECT shingle, count(*) AS ng FROM sh GROUP BY shingle)
        |SELECT
        |  CAST(SUM(CASE WHEN ng = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_exact_inter,
        |  CAST(count(*) AS BIGINT) AS n_exact_union,
        |  true AS inter_ok
        |FROM g""".stripMargin,
    "cdc_diff_changelog" ->
      """WITH b AS (
        |  SELECT user_id, MAX(event_type) AS event_type,
        |    MAX(CAST(ROUND(value * 1000) AS BIGINT)) AS value_milli
        |  FROM events WHERE event_id % 2 = 0 GROUP BY user_id
        |), a AS (
        |  SELECT user_id, MAX(event_type) AS event_type,
        |    MAX(CAST(ROUND(value * 1000) AS BIGINT)) AS value_milli
        |  FROM events WHERE event_id % 2 = 1 GROUP BY user_id
        |), j AS (
        |  SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |    a.user_id IS NOT NULL AS in_a, b.user_id IS NOT NULL AS in_b,
        |    a.event_type AS a_et, a.value_milli AS a_vm,
        |    b.event_type AS b_et, b.value_milli AS b_vm
        |  FROM b FULL OUTER JOIN a ON a.user_id = b.user_id
        |), cls AS (
        |  SELECT user_id, a_et, a_vm,
        |    CASE WHEN NOT in_b THEN 'update'
        |         WHEN NOT in_a THEN 'erase'
        |         WHEN a_et IS DISTINCT FROM b_et
        |           OR a_vm IS DISTINCT FROM b_vm THEN 'update'
        |         ELSE 'noop' END AS op
        |  FROM j)
        |SELECT user_id,
        |  CASE WHEN op <> 'erase' THEN a_et END AS event_type,
        |  CASE WHEN op <> 'erase' THEN a_vm END AS value_milli,
        |  op
        |FROM cls WHERE op <> 'noop' ORDER BY user_id""".stripMargin,
    "text_dedup_spans" ->
      """WITH base AS (
        |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
        |    t -> lower(t)) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6]
        |      || ' ' || tk[i+7] AS gram
        |  FROM base, UNNEST(range(1, greatest(len(tk) - 6, 1))) AS r(i)
        |), dup AS (
        |  SELECT gram FROM g GROUP BY gram
        |  HAVING count(DISTINCT doc_id) >= 2
        |), cov AS (
        |  SELECT DISTINCT g.doc_id, CAST(r.idx AS INT) AS idx
        |  FROM g JOIN dup USING (gram),
        |    UNNEST(range(g.pos, g.pos + 8)) AS r(idx)
        |), ti AS (
        |  SELECT doc_id, CAST(generate_subscripts(tk, 1) - 1 AS INT) AS idx,
        |    unnest(tk) AS tok
        |  FROM base
        |), kept AS (
        |  SELECT ti.doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    md5(string_agg(ti.tok, ' ' ORDER BY ti.idx)) AS kept_md5
        |  FROM ti ANTI JOIN cov ON cov.doc_id = ti.doc_id
        |    AND cov.idx = ti.idx
        |  GROUP BY ti.doc_id)
        |SELECT b.doc_id, CAST(len(b.tk) AS BIGINT) AS n_tokens,
        |  coalesce(k.n_kept, 0) AS n_kept,
        |  CAST(len(b.tk) AS BIGINT) - coalesce(k.n_kept, 0) AS n_removed,
        |  coalesce(k.kept_md5, md5('')) AS kept_md5
        |FROM base b LEFT JOIN kept k ON k.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "text_unigram_nll" ->
      """WITH toks AS (
        |  SELECT doc_id, lower(tt.tok) AS tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(trim(text), '\s+')) AS tok
        |    FROM documents) tt
        |), dt AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS n_occ
        |  FROM toks GROUP BY doc_id, tok
        |), lm AS (
        |  SELECT tok, CAST(SUM(n_occ) AS BIGINT) AS c FROM dt GROUP BY tok
        |), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM lm),
        |sc AS (
        |  SELECT dt.doc_id, dt.n_occ,
        |    CAST(ROUND(ln(CAST(lm.c AS DOUBLE) / CAST(tot.n_total AS DOUBLE))
        |      * 1e6) AS BIGINT) AS lp_micro
        |  FROM dt JOIN lm USING (tok) CROSS JOIN tot)
        |SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_tokens,
        |  CAST(SUM(-lp_micro * n_occ) AS BIGINT) AS sum_nll_micro,
        |  CAST(SUM(-lp_micro * n_occ) AS DOUBLE)
        |    / CAST(SUM(n_occ) AS DOUBLE) / 1e6 AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, lower(tt.term) AS term FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents) tt
        |), tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM terms GROUP BY doc_id, term
        |), dfreq AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df_t
        |  FROM tf GROUP BY term
        |), n AS (SELECT count(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
        |    ROUND(CAST(tf.tf AS DOUBLE) *
        |      ROUND(ln(CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df_t AS DOUBLE)), 6),
        |      6) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER
        |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM s)
        |SELECT doc_id, term, tf, df_t, score, CAST(rank AS INT) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "text_dup_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_transform(string_split_regex(trim(text), '\s+'),
        |    t -> lower(t)) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT doc_id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6]
        |      || ' ' || tk[i+7] AS gram
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 6, 1))) AS r(i)
        |), st AS (
        |  SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
        |), per AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(count(*) FILTER (WHERE st.nd >= 2) AS BIGINT) AS n_dup_grams
        |  FROM g JOIN st USING (gram) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(per.n_grams, 0) AS n_grams,
        |  coalesce(per.n_dup_grams, 0) AS n_dup_grams,
        |  CASE WHEN coalesce(per.n_grams, 0) > 0
        |    THEN CAST(per.n_dup_grams AS DOUBLE) / CAST(per.n_grams AS DOUBLE)
        |    ELSE 0.0 END AS dup_frac
        |FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id::VARCHAR || '@example.com'
        |      || (CASE WHEN doc_id % 3 = 0 THEN ' cc bob@test.org' ELSE '' END)
        |      || ' call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
        |      || ' from ' || (doc_id % 223 + 1)::VARCHAR || '.'
        |      || ((doc_id * 7) % 256)::VARCHAR || '.'
        |      || ((doc_id * 13) % 256)::VARCHAR || '.'
        |      || ((doc_id * 29) % 251)::VARCHAR AS a
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(a,
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(a,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
        |    AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(a,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'))
        |    AS red_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    "text_mix_epochs" ->
      """WITH e AS (
        |  SELECT doc_id, source,
        |    CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 3
        |         WHEN CAST(substr(source, 4) AS INT) < 10 THEN 2
        |         ELSE 1 END AS epochs
        |  FROM documents)
        |SELECT doc_id, source, CAST(r.ep AS BIGINT) AS epoch,
        |  md5(doc_id::VARCHAR || '#' || r.ep::VARCHAR) AS mix_key
        |FROM e, UNNEST(range(1, epochs + 1)) AS r(ep)
        |ORDER BY doc_id, epoch""".stripMargin,
    "text_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |      tk[i+3] || ' ' || tk[i+4] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 3, 1))) AS r(i)
        |), bsh AS (
        |  SELECT DISTINCT shingle FROM sh WHERE id < 10
        |), bits AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5(sd.s::VARCHAR || '|' || shingle), 1, 15))
        |      AS BIGINT) % 262144 AS bit
        |  FROM bsh, (SELECT unnest(range(0, 2)) AS s) sd
        |), cb AS (
        |  SELECT id,
        |    CAST(('0x' || substr(md5('0|' || shingle), 1, 15)) AS BIGINT)
        |      % 262144 AS bp0,
        |    CAST(('0x' || substr(md5('1|' || shingle), 1, 15)) AS BIGINT)
        |      % 262144 AS bp1
        |  FROM sh
        |), bloom AS (
        |  SELECT DISTINCT id FROM cb
        |  WHERE bp0 IN (SELECT bit FROM bits)
        |    AND bp1 IN (SELECT bit FROM bits)
        |), exact AS (
        |  SELECT DISTINCT id FROM sh
        |  WHERE shingle IN (SELECT shingle FROM bsh))
        |SELECT d.doc_id,
        |  (b.id IS NOT NULL) AS bloom_hit,
        |  (x.id IS NOT NULL) AS exact_hit,
        |  (b.id IS NOT NULL AND x.id IS NULL) AS false_pos
        |FROM documents d
        |LEFT JOIN bloom b ON b.id = d.doc_id
        |LEFT JOIN exact x ON x.id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin)
}
