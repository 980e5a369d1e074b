package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 2: market-basket rules, bounded-radius centrality,
  * and the CDC quarantine report.
  *
  *  - `ev_assoc_rules`: association rules (support / confidence /
  *    lift) over per-user event-type baskets — the co-occurrence
  *    audit upgraded to directional rules on the micro lattice.
  *  - `graph_harmonic3`: harmonic centrality truncated at radius 3
  *    over the simhash near-dup graph (the `graph_triangles` /
  *    `graph_clustering_coeff` edge set, so all three audits describe
  *    one graph). Truncation is what makes centrality computable at
  *    scale — exact closeness needs all-pairs distances; the 3-ball
  *    is the standard production compromise (same cutoff as
  *    `graph_bfs_layers`).
  *  - `cdc_dead_letter`: malformed-envelope classification — the
  *    quarantine/DLQ report every at-least-once pipeline needs
  *    before it can promise "no silent drops". Reason codes are
  *    purely JSON-structural so the report is engine-portable.
  *
  * 100 TB shapes: assoc rules collapse the corpus to distinct
  * (user, type) rows once (one shuffle), pair fan-out is bounded by
  * |types|-per-user (the basket width, NOT corpus size), and every
  * denominator rides in-plan (first-occurrence window for the user
  * count — no driver action, no cross join); harmonic centrality
  * expands collision-bounded near-dup balls with per-round distinct
  * + anti-join frontier pruning (each round one equi-join, cached —
  * the graph_kcore lesson); the dead-letter report is one narrow
  * classification projection + a |reasons|-bounded aggregate.
  */
object Ext16Queries {

  // ---------------------------------------------------------------
  // ev_assoc_rules
  // ---------------------------------------------------------------

  /** Association rules A→B over per-user event-type baskets:
    *   support(A→B) = n(A∧B) / N         (micro)
    *   confidence   = n(A∧B) / n(A)      (micro)
    *   lift         = conf / (n(B) / N)  (micro, exact integer:
    *                  n_ab·N·1e6 div (n_a·n_b))
    * N = users with any event, attached in-plan via the
    * first-occurrence trick (whole-set windows cannot COUNT DISTINCT,
    * but SUM of a per-user first-row flag is the same number).
    */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy("user_id").orderBy("event_type")
    val ut = t(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
      .withColumn("is_first",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .withColumn("n_users",
        sum("is_first").over(Window.partitionBy()))
      .cache()
    val na = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    // rename before the self-join: two frames off ONE parent resolve
    // a shared column name to the same attribute (trivially-true trap)
    val b = ut.select(col("user_id").as("uid_b"),
      col("event_type").as("cons"))
    val pairs = ut
      .select(col("user_id"), col("event_type").as("ante"),
        col("n_users"))
      .join(b, col("user_id") === col("uid_b")
        && col("ante") =!= col("cons"))
      .groupBy("ante", "cons")
      .agg(count(lit(1)).as("n_ab"), max("n_users").as("n_users"))
    pairs
      .join(broadcast(na.select(col("event_type").as("ante"),
        col("n_t").as("n_a"))), Seq("ante"))
      .join(broadcast(na.select(col("event_type").as("cons"),
        col("n_t").as("n_b"))), Seq("cons"))
      .select(col("ante"), col("cons"), col("n_ab"),
        expr("n_ab * 1000000 div n_users").as("support_micro"),
        expr("n_ab * 1000000 div n_a").as("confidence_micro"),
        expr("n_ab * n_users * 1000000 div (n_a * n_b)")
          .as("lift_micro"))
      .orderBy("ante", "cons")
  }

  // ---------------------------------------------------------------
  // graph_harmonic3
  // ---------------------------------------------------------------

  /** Hub-relay degree cap for the BFS ring expansion: rings may not
    * pass THROUGH nodes of degree > 64 (they still appear as ring
    * members — only their onward fan-out is cut). Same constant and
    * rationale as `graph_link_predict`'s maxDeg prune: Σdeg³ ring
    * cost is cubic in local density, and on a power-law graph the
    * hubs are boilerplate-attractors, not signal. Inert at sf0.01
    * (max degree 5) and sf0.1 (max 59); binding at sf1 (max 398,
    * p99 = 175) where the uncapped 3-ball measured 16M pairs / 153 s
    * on the 10× probe. Mirrored verbatim in the oracle SQL so both
    * engines compute the SAME capped metric at every SF.
    */
  private val MaxRelayDeg = 64

  /** Harmonic centrality within radius 3: h(v) = Σ_{0<d(u,v)≤3}
    * 1/d(u,v) on the micro lattice, by BFS ring construction —
    * ring k = (ring k−1 ⋈ relay edges) minus all closer rings, each
    * round distinct'd and cached (it feeds the next ring AND the
    * final aggregate); expansion is hub-capped (see [[MaxRelayDeg]]).
    * Isolated documents (no near-dup edge) have no row — the report
    * covers the graph, not the corpus.
    */
  def harmonic3(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
    val d1 = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().cache()
    val relay = d1.groupBy(col("u").as("m"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= MaxRelayDeg).select("m")
    val hop = d1.select(col("u").as("m"), col("v").as("w"))
      .join(relay, "m")
    val d2 = d1.join(hop, col("v") === col("m"))
      .select(col("u"), col("w").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .join(d1, Seq("u", "v"), "left_anti")
      .cache()
    val d3 = d2.join(hop, col("v") === col("m"))
      .select(col("u"), col("w").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .join(d1, Seq("u", "v"), "left_anti")
      .join(d2, Seq("u", "v"), "left_anti")
    d1.withColumn("dist", lit(1L))
      .unionByName(d2.withColumn("dist", lit(2L)))
      .unionByName(d3.withColumn("dist", lit(3L)))
      .groupBy(col("u").as("node"))
      .agg(sum(when(col("dist") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("dist") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("dist") === 3, 1L).otherwise(0L)).as("n3"),
        sum(expr("1000000 div dist")).as("h_micro"))
      .orderBy("node")
  }

  // ---------------------------------------------------------------
  // cdc_dead_letter
  // ---------------------------------------------------------------

  private def s(c: Column): Column = c.cast("string")

  /** Deterministic malformed-envelope mix on `event_id % 10` (a
    * SEPARATE mix from CdcQueries' — this one injects envelopes the
    * parser must quarantine, not route):
    *   0 → truncated JSON (last 2 chars cut)
    *   1 → empty key array
    *   2 → key but no update/newImage/erase action
    *   3 → non-numeric key element
    *   else → well-formed update
    */
  private def dlqEnvelope: Column = {
    val payload = concat(lit("{\"user_id\":"), s(col("user_id")),
      lit(",\"event_type\":\""), col("event_type"),
      lit("\",\"value_milli\":"),
      s(round(col("value") * 1000).cast("long")), lit("}"))
    val good = concat(lit("{\"key\":["), s(col("user_id")),
      lit("],\"update\":"), payload, lit("}"))
    val sel = col("event_id") % 10
    when(sel === 0, expr("substr(good, 1, length(good) - 2)"))
      .when(sel === 1, concat(lit("{\"key\":[],\"update\":"), payload,
        lit("}")))
      .when(sel === 2, concat(lit("{\"key\":["), s(col("user_id")),
        lit("]}")))
      .when(sel === 3, concat(lit("{\"key\":[\"k"), s(col("user_id")),
        lit("\"],\"update\":"), payload, lit("}")))
      .otherwise(col("good"))
  }

  /** Dead-letter classification report: route every envelope to a
    * reason code (first matching rule wins — not_json > no_key >
    * bad_key_type > no_action > ok) and aggregate counts + an id
    * range per reason, the minimum a human needs to pull quarantined
    * messages back out of the topic. The reference's parser throws
    * away silently only the newImage-alone case (CdcMsgParser.java:
    * 81-82) and fails the pipeline on the rest; a quarantine report
    * is the operational upgrade — at-least-once with NO silent drops.
    */
  def deadLetter(spark: SparkSession, dir: String): DataFrame = {
    val env = t(spark, dir, "events")
      .withColumn("good", {
        val payload = concat(lit("{\"user_id\":"), s(col("user_id")),
          lit(",\"event_type\":\""), col("event_type"),
          lit("\",\"value_milli\":"),
          s(round(col("value") * 1000).cast("long")), lit("}"))
        concat(lit("{\"key\":["), s(col("user_id")),
          lit("],\"update\":"), payload, lit("}"))
      })
      .select(col("event_id"), dlqEnvelope.as("env"))
    // ONE Jackson pass per envelope (the CdcParse single-parse fast
    // path): PERMISSIVE from_json with a corrupt-record column makes
    // every reason code a field test on the already-parsed struct —
    // vs six get_json_object calls each re-parsing the full JSON.
    // StringType action fields capture the raw object subtree, so
    // presence/absence matches `$.update`-style extraction exactly;
    // array<string> key elements stringify numeric tokens, so the
    // try_cast probe is byte-identical to json_extract_string.
    val schema = "key array<string>, update string, " +
      "newImage string, erase string, _corrupt string"
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> "_corrupt")
    val k0 = try_element_at(col("p.key"), lit(1))
    env
      .withColumn("p", from_json(col("env"), schema, opts))
      .withColumn("reason",
        when(col("p").isNull || col("p._corrupt").isNotNull, "not_json")
          .when(k0.isNull, "no_key")
          .when(k0.try_cast("long").isNull, "bad_key_type")
          .when(col("p.update").isNull && col("p.newImage").isNull &&
            col("p.erase").isNull, "no_action")
          .otherwise("ok"))
      .groupBy("reason")
      .agg(count(lit(1)).as("n_msgs"),
        min("event_id").as("first_id"),
        max("event_id").as("last_id"))
      .orderBy("reason")
  }

  // ---------------------------------------------------------------
  // q70_band_planned
  // ---------------------------------------------------------------

  /** The planned interval (band) join on an ASYMMETRIC band: for each
    * event, every other event of the same user in [t − 120 s,
    * t + 300 s] — the window a click-attribution pass actually wants
    * (short lookback, longer lookforward), which the symmetric
    * bucket-explode composition (q22) cannot express without
    * widening to the larger bound and re-filtering. Runs on
    * `plans/BandJoinPlan.scala`: declared ClusteredDistribution +
    * (key, time) ordering, single merge sweep, sliding buffer bounded
    * by band occupancy. Self pairs are excluded HERE (id filter) —
    * the operator joins the band exactly and leaves row identity to
    * the query.
    */
  def bandPlanned(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"))
    val r = ev.select(col("user_id"), col("tsec").as("rtsec"),
      col("event_id").as("rid"))
    graft.plans.PlannedBandJoin.bandJoin(ev, r, Seq("user_id"),
        "tsec", "rtsec", before = 120L, after = 300L,
        payload = Seq("rid", "rtsec"))
      .filter(col("event_id") =!= col("rid"))
      .select(col("user_id"), col("event_id").as("id_a"),
        col("rid").as("id_b"),
        (col("rtsec") - col("tsec")).as("dt_sec"))
      .orderBy("user_id", "id_a", "id_b")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_assoc_rules" -> assocRules _,
    "graph_harmonic3" -> harmonic3 _,
    "cdc_dead_letter" -> deadLetter _,
    "q70_band_planned" -> bandPlanned _,
  )

  def oracle: Map[String, String] = Map(
    "q70_band_planned" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec
        |  FROM events)
        |SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  b.tsec - a.tsec AS dt_sec
        |FROM ev a JOIN ev b
        |  ON a.user_id = b.user_id AND a.event_id <> b.event_id
        |  AND b.tsec BETWEEN a.tsec - 120 AND a.tsec + 300
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,
    "ev_assoc_rules" ->
      """WITH ut AS (
        |  SELECT DISTINCT user_id, event_type FROM events
        |), nu AS (
        |  SELECT COUNT(DISTINCT user_id) AS n_users FROM ut
        |), na AS (
        |  SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1
        |), ab AS (
        |  SELECT a.event_type AS ante, b.event_type AS cons,
        |    COUNT(*) AS n_ab
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type
        |  GROUP BY 1, 2)
        |SELECT ab.ante, ab.cons, ab.n_ab,
        |  (ab.n_ab * 1000000) // nu.n_users AS support_micro,
        |  (ab.n_ab * 1000000) // na.n_t AS confidence_micro,
        |  (ab.n_ab * nu.n_users * 1000000) // (na.n_t * nb.n_t)
        |    AS lift_micro
        |FROM ab
        |JOIN na ON na.event_type = ab.ante
        |JOIN na nb ON nb.event_type = ab.cons
        |CROSS JOIN nu
        |ORDER BY ante, cons""".stripMargin,
    "graph_harmonic3" ->
      (Ext14Queries.simhashPairsCte +
        """, e AS (
        |  SELECT a AS u, b AS v FROM pairs
        |  UNION ALL
        |  SELECT b AS u, a AS v FROM pairs
        |), d1 AS (
        |  SELECT DISTINCT u, v FROM e
        |), relay AS (
        |  SELECT u AS m FROM d1 GROUP BY u HAVING COUNT(*) <= 64
        |), hop AS (
        |  SELECT d1.u AS m, d1.v AS w FROM d1
        |  JOIN relay ON relay.m = d1.u
        |), d2 AS (
        |  SELECT DISTINCT x.u, y.w AS v
        |  FROM d1 x JOIN hop y ON x.v = y.m
        |  WHERE x.u <> y.w
        |    AND NOT EXISTS (SELECT 1 FROM d1 z
        |      WHERE z.u = x.u AND z.v = y.w)
        |), d3 AS (
        |  SELECT DISTINCT x.u, y.w AS v
        |  FROM d2 x JOIN hop y ON x.v = y.m
        |  WHERE x.u <> y.w
        |    AND NOT EXISTS (SELECT 1 FROM d1 z
        |      WHERE z.u = x.u AND z.v = y.w)
        |    AND NOT EXISTS (SELECT 1 FROM d2 z
        |      WHERE z.u = x.u AND z.v = y.w)
        |), allr AS (
        |  SELECT u, v, 1 AS dist FROM d1
        |  UNION ALL SELECT u, v, 2 FROM d2
        |  UNION ALL SELECT u, v, 3 FROM d3)
        |SELECT u AS node,
        |  CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n1,
        |  CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n2,
        |  CAST(SUM(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n3,
        |  CAST(SUM(1000000 // dist) AS BIGINT) AS h_micro
        |FROM allr GROUP BY u
        |ORDER BY node""".stripMargin),
    "cdc_dead_letter" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), g AS (
        |  SELECT event_id,
        |    '{"user_id":' || CAST(user_id AS VARCHAR)
        |      || ',"event_type":"' || event_type
        |      || '","value_milli":' || CAST(vm AS VARCHAR) || '}'
        |      AS pay,
        |    CAST(user_id AS VARCHAR) AS uid
        |  FROM e
        |), env AS (
        |  SELECT event_id,
        |    CASE event_id % 10
        |      WHEN 0 THEN substr('{"key":[' || uid || '],"update":'
        |        || pay || '}', 1,
        |        length('{"key":[' || uid || '],"update":' || pay
        |          || '}') - 2)
        |      WHEN 1 THEN '{"key":[],"update":' || pay || '}'
        |      WHEN 2 THEN '{"key":[' || uid || ']}'
        |      WHEN 3 THEN '{"key":["k' || uid || '"],"update":'
        |        || pay || '}'
        |      ELSE '{"key":[' || uid || '],"update":' || pay || '}'
        |    END AS env
        |  FROM g
        |), cls AS (
        |  SELECT event_id,
        |    CASE
        |      WHEN NOT json_valid(env) THEN 'not_json'
        |      WHEN json_extract_string(env, '$.key[0]') IS NULL
        |        THEN 'no_key'
        |      WHEN TRY_CAST(json_extract_string(env, '$.key[0]')
        |          AS BIGINT) IS NULL THEN 'bad_key_type'
        |      WHEN json_extract(env, '$.update') IS NULL
        |        AND json_extract(env, '$.newImage') IS NULL
        |        AND json_extract(env, '$.erase') IS NULL
        |        THEN 'no_action'
        |      ELSE 'ok'
        |    END AS reason
        |  FROM env)
        |SELECT reason, COUNT(*) AS n_msgs,
        |  MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |FROM cls GROUP BY reason
        |ORDER BY reason""".stripMargin,
  )
}
