package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 4: incremental cluster maintenance, envelope drift
  * detection, and the multi-aggregate pivot surface.
  *
  *  - `dedup_cc_incremental`: incremental maintenance of the
  *    connected-component LABEL table under a batch of new edges —
  *    the production path for keeping the dedup cluster assignment
  *    fresh without re-running CC over the whole pair graph. Delta
  *    edges CONTRACT to label-graph edges (each endpoint replaced by
  *    its stored label); CC runs on that tiny contracted graph; the
  *    resulting label→label map relabels only the touched
  *    components. At 100 TB the contracted graph is |delta|-bounded
  *    while the full graph is corpus-sized — this is why production
  *    dedup clusters update in minutes, not hours. Invariant (the
  *    oracle): incremental == full CC over all edges.
  *  - `cdc_schema_drift`: unexpected-key detection over the CDC
  *    envelope stream — upstream added a column the pipeline schema
  *    does not know (deterministically injected for event_id % 17 ==
  *    0, the PII-injection discipline). Reports each unexpected key
  *    with count and first/last sequence — what an operator reads
  *    before deciding to evolve the sink schema (cdc_schema_evolve
  *    is the apply side; this is the detect side).
  *  - `q75_pivot_multi`: PIVOT with MULTIPLE aggregates per cell
  *    (sum + count per order-priority column group) — the wide-report
  *    surface q15's single-agg pivot does not cover; Spark emits
  *    `{value}_{agg}` columns from one shuffle.
  *
  * 100 TB shapes: the contraction is two hash joins of the delta
  * against the stored label table (broadcast when the delta is
  * small) + CC on a graph whose size tracks the DELTA, not the
  * corpus; drift detection is a narrow JSON-keys projection with a
  * |distinct keys|-sized rollup; the pivot is one partial-aggregated
  * shuffle on the group key.
  */
object Ext41Queries {

  // ---------------------------------------------------------------
  // dedup_cc_incremental
  // ---------------------------------------------------------------

  /** The stored base-graph label table (docs outside the id%10==3
    * delta) — the state [[ccIncremental]] updates; exposed so Bench
    * charges its build as a `derived:*` entry.
    */
  def baseCcLabels(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.lshPairs(spark, dir)
      .select("id_a", "id_b")
    val isDelta = col("id_a") % 10 === 3 || col("id_b") % 10 === 3
    graft.Derived.table(spark, s"cclabels_base:$dir")(
      Dedup.connectedComponents(pairs.filter(!isDelta)))
  }

  def ccIncremental(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.lshPairs(spark, dir)
      .select("id_a", "id_b")
    // the day's "new docs": either endpoint with id % 10 == 3 makes
    // the edge part of the delta batch
    val isDelta = col("id_a") % 10 === 3 || col("id_b") % 10 === 3
    val deltaPairs = pairs.filter(isDelta).cache()
    // stored state: labels of the base graph (cluster = min id) —
    // parquet-materialized via Derived because this IS the stored
    // table the incremental path exists to avoid rebuilding (a
    // .cache() would die under the harness' between-query clearCache
    // and the probe would re-run base CC per measurement)
    val baseLabels = baseCcLabels(spark, dir)
    // nodes first seen in the delta start as their own singleton
    val labels0 = baseLabels.unionByName(
      deltaPairs
        .select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .distinct()
        .join(baseLabels, Seq("id"), "left_anti")
        .withColumn("cluster", col("id"))).cache()
    // CONTRACT: delta edges become label-graph edges
    val lblEdges = deltaPairs
      .join(labels0.select(col("id").as("id_a"), col("cluster").as("la")),
        "id_a")
      .join(labels0.select(col("id").as("id_b"), col("cluster").as("lb")),
        "id_b")
      .select(col("la").as("id_a"), col("lb").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .distinct()
    // CC on the contracted graph: label -> merged component min,
    // which IS the global min id (every label is its component's min
    // id, so the min over merged labels is the min over merged ids)
    val lblMap = Dedup.connectedComponents(lblEdges)
      .select(col("id").as("cluster"), col("cluster").as("merged"))
    labels0.join(lblMap, Seq("cluster"), "left")
      .select(col("id"),
        coalesce(col("merged"), col("cluster")).as("cluster"))
      .withColumn("is_canonical", col("id") === col("cluster"))
      .orderBy("id")
  }

  // ---------------------------------------------------------------
  // cdc_schema_drift
  // ---------------------------------------------------------------

  private[graft] val ExpectedKeys =
    Seq("user_id", "event_type", "value_milli")

  /** The drifted update-payload JSON (every 17th envelope carries an
    * undeclared `region_code`) — shared by the batch query and the
    * streaming monitor's spec so both watch the identical stream.
    */
  private[graft] def driftedUpdateJson: org.apache.spark.sql.Column = {
    val id = col("event_id")
    concat(
      lit("{\"user_id\":"), col("user_id").cast("string"),
      lit(",\"event_type\":\""), col("event_type"),
      lit("\",\"value_milli\":"),
      round(col("value") * 1000).cast("long").cast("string"),
      when(id % 17 === 0,
        concat(lit(",\"region_code\":"), (id % 50).cast("string")))
        .otherwise(lit("")),
      lit("}"))
  }

  def schemaDrift(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"), driftedUpdateJson.as("update_json"))
      .select(col("event_id"),
        explode(json_object_keys(col("update_json"))).as("key"))
      .filter(!col("key").isInCollection(ExpectedKeys))
      .groupBy("key")
      .agg(count(lit(1)).as("n_msgs"),
        min("event_id").as("first_seq"),
        max("event_id").as("last_seq"))
      .orderBy("key")

  // ---------------------------------------------------------------
  // q75_pivot_multi
  // ---------------------------------------------------------------

  def pivotMulti(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
    t(spark, dir, "orders")
      .select(col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .filter(col("o_orderpriority").isin(prios: _*))
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", prios)
      .agg(sum("price").cast("double").as("total"),
        count(lit(1)).as("n"))
      // empty (status, prio) cells: count is 0, not null (the sum
      // stays null — no rows to total), matching the oracle's
      // SUM(CASE ... ELSE 0) / SUM(CASE ... END) split
      .na.fill(0L, prios.map(_ + "_n"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cc_incremental" -> ccIncremental _,
    "cdc_schema_drift" -> schemaDrift _,
    "q75_pivot_multi" -> pivotMulti _,
  )

  val oracle: Map[String, String] = Map(
    // full CC over ALL verified pairs (the dedup_clusters walk) —
    // incremental == full recompute is the invariant
    "dedup_cc_incremental" ->
      """WITH RECURSIVE toks AS (
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
        |  GROUP BY c.id_a, c.id_b),
        |pairs AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sizes sa ON sa.id = id_a
        |  JOIN sizes sb ON sb.id = id_b
        |  WHERE CAST(common AS DOUBLE)
        |    / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |walk(a, b) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b)
        |SELECT a AS id, MIN(b) AS cluster,
        |  (a = MIN(b)) AS is_canonical
        |FROM walk GROUP BY a ORDER BY a""".stripMargin,
    "cdc_schema_drift" ->
      """WITH env AS (
        |  SELECT event_id,
        |    '{"user_id":' || CAST(user_id AS VARCHAR)
        |    || ',"event_type":"' || event_type
        |    || '","value_milli":'
        |    || CAST(CAST(round(value * 1000) AS BIGINT) AS VARCHAR)
        |    || CASE WHEN event_id % 17 = 0
        |      THEN ',"region_code":' || CAST(event_id % 50 AS VARCHAR)
        |      ELSE '' END
        |    || '}' AS update_json
        |  FROM events
        |), ks AS (
        |  SELECT event_id, unnest(json_keys(update_json)) AS key
        |  FROM env)
        |SELECT key, CAST(count(*) AS BIGINT) AS n_msgs,
        |  CAST(min(event_id) AS BIGINT) AS first_seq,
        |  CAST(max(event_id) AS BIGINT) AS last_seq
        |FROM ks
        |WHERE key NOT IN ('user_id', 'event_type', 'value_milli')
        |GROUP BY key
        |ORDER BY key""".stripMargin,
    "q75_pivot_multi" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |    AS DOUBLE) AS "1-URGENT_total",
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT_n",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |    AS DOUBLE) AS "2-HIGH_total",
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH_n",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |    AS DOUBLE) AS "3-MEDIUM_total",
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM_n"
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
  )
}
