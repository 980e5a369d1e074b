package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch 2: experimentation + graph-audit corners.
  *
  *  - `ev_cuped`: CUPED variance reduction (Deng et al. 2013) — the
  *    standard pre-experiment-covariate adjustment every experiment
  *    platform applies before reading an A/B metric.
  *  - `graph_eff_diameter`: pivot-sampled reach fractions at radius
  *    1..3 over the simhash near-dup graph (the effective-diameter
  *    probe; same 8 hash pivots + hub-relay cap as
  *    `graph_betweenness_sampled`, so the two audits describe one
  *    sampled path system).
  */
object Ext86Queries {

  // ---------------------------------------------------------------
  // ev_cuped
  // ---------------------------------------------------------------

  /** CUPED-adjusted A/B readout on the `user_id % 2` split: the
    * pre-period covariate X is a user's vm-sum over hours strictly
    * below the corpus hour midpoint, the metric Y is the vm-sum at or
    * above it; θ = cov(X,Y)/var(X) pooled across arms, and
    * Ycuped = Y − θ(X − X̄) per user. Per-user X/Y and all five
    * moment sums (ΣX, ΣY, ΣX², ΣY², ΣXY, per arm and pooled) are
    * exact BIGINTs (headroom: per-user vm-sums ~2.4e6 at sf0.1,
    * squares ~6e12, summed <1e17 at 10× sf1); θ and the arm means /
    * variances are then closed-form double expressions over those
    * integer moments with IDENTICAL expression text in the oracle
    * (the q62_skew_kurtosis discipline — n-scaled moment identities,
    * one final micro rounding). Reported per arm: user count, raw
    * mean, CUPED mean, raw and CUPED variance, and the variance-
    * reduction share 1 − var(Ycuped)/var(Y) ≈ ρ² — the number that
    * says how much experiment runtime CUPED buys.
    *
    * 100 TB shape: one (user, period) keyed aggregate collapses the
    * event log to |users| rows of (arm, x, y); everything after is a
    * ≤2-row moment aggregate and scalar arithmetic — the same
    * collapse every ev_ab_* audit rides. The pooled 1-row moment
    * frame broadcasts into the 2-row arm frame.
    */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"),
        expr("ts div 3600000000000").as("hr"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val mid = ev.agg(expr("(min(hr) + max(hr)) div 2").as("mid"))
    val xy = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(when(col("hr") < col("mid"), col("vm"))
          .otherwise(0L)).as("x"),
        sum(when(col("hr") >= col("mid"), col("vm"))
          .otherwise(0L)).as("y"))
      .withColumn("arm", col("user_id") % 2)
    val pooled = xy.agg(count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
    val arms = xy.groupBy("arm").agg(count(lit(1)).as("n_a"),
      sum("x").as("sx_a"), sum("y").as("sy_a"),
      sum(expr("x * x")).as("sxx_a"),
      sum(expr("y * y")).as("syy_a"),
      sum(expr("x * y")).as("sxy_a"))
    // θ, means and variances as closed forms over the moment sums —
    // identical expression text in the oracle. Each SUM is an exact
    // BIGINT (<1e17 headroom), but the n·sxy-style PRODUCTS scale
    // ~N² and would wrap Long far below the 100 TB shape (Spark
    // wraps silently, DuckDB raises — the fleiss overflow class), so
    // every sum is cast to double BEFORE the products: θ lives in
    // double-land anyway and the n-scaled identity needs no exact
    // products. var(X) > 0 whenever two users differ in pre-period
    // activity (greatest guards the all-identical degenerate corpus).
    arms.crossJoin(broadcast(pooled))
      .withColumn("theta", expr(
        "(cast(n as double) * cast(sxy as double)" +
          " - cast(sx as double) * cast(sy as double))" +
          " / greatest(cast(n as double) * cast(sxx as double)" +
          " - cast(sx as double) * cast(sx as double), 1.0d)"))
      .withColumn("xbar", expr("cast(sx as double) / cast(n as double)"))
      .withColumn("mean_y", expr(
        "cast(sy_a as double) / cast(n_a as double)"))
      .withColumn("mean_cuped", expr(
        "(cast(sy_a as double) - theta * (cast(sx_a as double)" +
          " - cast(n_a as double) * xbar)) / cast(n_a as double)"))
      .withColumn("var_y", expr(
        "cast(syy_a as double) / cast(n_a as double)" +
          " - (cast(sy_a as double) / cast(n_a as double))" +
          " * (cast(sy_a as double) / cast(n_a as double))"))
      // var(Y − θX) per arm = varY − 2θ covXY + θ² varX, each term
      // the n-scaled identity over the arm's integer moments
      .withColumn("var_cuped", expr(
        "var_y - 2.0d * theta * (cast(sxy_a as double)" +
          " / cast(n_a as double) - (cast(sx_a as double)" +
          " / cast(n_a as double)) * (cast(sy_a as double)" +
          " / cast(n_a as double)))" +
          " + theta * theta * (cast(sxx_a as double)" +
          " / cast(n_a as double) - (cast(sx_a as double)" +
          " / cast(n_a as double)) * (cast(sx_a as double)" +
          " / cast(n_a as double)))"))
      .select(col("arm"), col("n_a").as("n_users"),
        expr("cast(round(theta * 1e6) as bigint)").as("theta_micro"),
        expr("cast(round(mean_y * 1e3) as bigint)").as("mean_y_milli"),
        expr("cast(round(mean_cuped * 1e3) as bigint)")
          .as("mean_cuped_milli"),
        expr("cast(round((1.0d - var_cuped" +
          " / greatest(var_y, 1.0d)) * 1e6) as bigint)")
          .as("var_reduction_micro"))
      .orderBy("arm")
  }

  // ---------------------------------------------------------------
  // graph_eff_diameter
  // ---------------------------------------------------------------

  /** Pivot-sampled reach fractions at radius 1..3 — the effective-
    * diameter audit (what share of the graph a node reaches within d
    * hops; eff. diameter is the d where the mean fraction crosses
    * 90%). Same 8 md5-chosen pivots, hub-relay cap and level
    * construction as [[Ext85Queries.betweennessSampled]] minus the σ
    * bookkeeping, so the centrality and diameter audits describe ONE
    * sampled path system. Reported per depth: pivot count, reached
    * node-slots summed across pivots, the node universe, and the
    * micro mean reach fraction (floored per pivot on the micro
    * lattice, then floored-mean — order-free integers end to end).
    *
    * 100 TB shape: NPivots × hub-capped 3-ball BFS, keyed equi-joins
    * and distinct aggregates only; the per-depth report is a ≤3-row
    * collapse.
    */
  def effDiameter(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
    val d1 = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().cache()
    val relay = d1.groupBy(col("u").as("m"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= 64).select("m")
    val hop = d1.select(col("u").as("hm"), col("v").as("hw"))
      .join(relay, col("hm") === col("m")).select("hm", "hw")
    // node universe as a 1-row broadcast — never a construction-time
    // driver job (the pageRank plan-embedded-count lesson)
    val uni = d1.select(col("u")).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val piv = d1.select(col("u").as("id")).distinct()
      .orderBy(md5(concat(lit("btw:"), col("id").cast("string"))),
        col("id"))
      .limit(8).select(col("id").as("s"))
    val l1 = broadcast(piv).join(d1, col("s") === col("u"))
      .select("s", "v").cache()
    def level(prev: DataFrame, closer: Seq[DataFrame]): DataFrame = {
      val stepped = prev.join(hop, col("v") === col("hm"))
        .select(col("s"), col("hw").as("v"))
        .filter(col("v") =!= col("s")).distinct()
      closer.foldLeft(stepped)((acc, c) =>
        acc.join(c, Seq("s", "v"), "left_anti"))
    }
    val l2 = level(l1, Seq(l1)).cache()
    val l3 = level(l2, Seq(l1, l2))
    def depthRow(ring: DataFrame, depth: Int,
        within: Seq[DataFrame]): DataFrame = {
      val cum = within.map(_.groupBy("s")
          .agg(count(lit(1)).as("c")))
        .reduce(_ unionByName _)
        .groupBy("s").agg(sum("c").as("reached"))
      cum.crossJoin(broadcast(uni)) // ≤8 rows × 1 row
        .withColumn("frac_micro",
          expr("reached * 1000000 div (n_nodes - 1)"))
        .withColumn("depth", lit(depth.toLong))
        // grouped (not global) aggregate: an empty pair graph then
        // yields ZERO rows, matching the oracle's GROUP BY depth —
        // a global agg would emit a 1-row (n_pivots=0, NULL) shape
        // the oracle never produces on degenerate corpora
        .groupBy("depth")
        .agg(count(lit(1)).as("n_pivots"),
          max("n_nodes").as("n_nodes"),
          sum("reached").as("sum_reached"),
          expr("sum(frac_micro) div count(1)")
            .as("mean_reach_micro"))
        .select("depth", "n_pivots", "n_nodes", "sum_reached",
          "mean_reach_micro")
    }
    depthRow(l1, 1, Seq(l1))
      .unionByName(depthRow(l2, 2, Seq(l1, l2)))
      .unionByName(depthRow(l3, 3, Seq(l1, l2, l3)))
      .orderBy("depth")
  }

  // ---------------------------------------------------------------
  // eval_krippendorff
  // ---------------------------------------------------------------

  /** Krippendorff's alpha (binary, nominal) over the same three
    * deterministic quality judges as `eval_fleiss_kappa`, but WITH
    * MISSING RATINGS — the case Fleiss cannot handle and the normal
    * state of an LLM-judge ensemble (judges time out, abstain, or
    * get filtered). Judge j abstains on doc d iff
    * (doc_id + j) % 7 == 0; units with fewer than 2 remaining
    * ratings are excluded (the standard rule).
    *
    * α = 1 − Do/De with Do = (1/n··)Σᵤ 2·n_u1·n_u0/(m_u−1) and
    * De = 2·n₁·n₀/(n··(n··−1)). With m_u ∈ {2,3} the per-unit term
    * (2·n_u1·n_u0) div (m_u−1) is EXACT (m=3 ⇒ n_u1·n_u0 even;
    * m=2 ⇒ divisor 1), so T = Σᵤ … is an exact BIGINT. Everything
    * after runs on N-INDEPENDENT micro lattices (the fleiss round-9
    * lesson applied from the start): do = ⌊T·10⁶/n··⌋ ≤ 2·10⁶,
    * p₁ = ⌊n₁·10⁶/n··⌋, de = ⌊2p₁(10⁶−p₁)/10⁶⌋,
    * a = ⌊do·10⁶/de⌋ ≤ 2·10¹², corr = ⌊(n··−1)·10⁶/n··⌋, and
    * α_micro = 10⁶ − ⌊a·corr/10¹²⌋ — the largest product a·corr is
    * ≤ 2·10¹⁸ for ANY corpus size; every division has non-negative
    * operands (div == //).
    *
    * 100 TB shape: one corpus pass computes all three votes, one
    * keyed aggregate collapses to per-unit (n1, m), one 1-row moment
    * aggregate; alpha is arithmetic on that row.
    */
  def krippendorff(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("toks",
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
      .withColumn("j1",
        when(col("n_chars") >= 200, 1L).otherwise(0L))
      .withColumn("j2",
        when(size(array_distinct(col("toks"))) * 2 >= size(col("toks")),
          1L).otherwise(0L))
      .withColumn("j3", when(
        size(filter(col("toks"), x => x.isin(
          TextAnalysis.enStopwords.map(lit): _*))) >= 2, 1L)
        .otherwise(0L))
    // missingness: judge j abstains iff (doc_id + j) % 7 == 0
    val units = docs.select(col("doc_id"),
        explode(array(
          struct(lit(1L).as("j"), col("j1").as("vote")),
          struct(lit(2L).as("j"), col("j2").as("vote")),
          struct(lit(3L).as("j"), col("j3").as("vote")))).as("r"))
      .filter(pmod(col("doc_id") + col("r.j"), lit(7)) =!= 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("m"), sum("r.vote").as("n1u"))
      .filter(col("m") >= 2)
      .withColumn("t_u", expr("(2 * n1u * (m - n1u)) div (m - 1)"))
    units.agg(count(lit(1)).as("n_units"),
        sum("m").as("n_dot"), sum("n1u").as("n_pos"),
        sum("t_u").as("t"))
      .withColumn("do_micro", expr("(t * 1000000) div n_dot"))
      .withColumn("p1", expr("(n_pos * 1000000) div n_dot"))
      .withColumn("de_micro", expr(
        "greatest((2 * p1 * (1000000 - p1)) div 1000000, 1)"))
      .withColumn("a", expr("(do_micro * 1000000) div de_micro"))
      .withColumn("corr", expr("((n_dot - 1) * 1000000) div n_dot"))
      .withColumn("alpha_micro",
        expr("1000000 - (a * corr) div 1000000000000"))
      .select("n_units", "n_dot", "n_pos", "do_micro", "de_micro",
        "alpha_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_cuped" -> cuped _,
    "graph_eff_diameter" -> effDiameter _,
    "eval_krippendorff" -> krippendorff _,
  )

  val oracle: Map[String, String] = Map(
    "eval_krippendorff" ->
      """WITH v AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents
        |), j AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS j1,
        |    CASE WHEN len(list_distinct(toks)) * 2 >= len(toks)
        |      THEN 1 ELSE 0 END AS j2,
        |    CASE WHEN len(list_filter(toks, x -> list_contains(
        |      ['the','a','of','and','in','to','is'], x))) >= 2
        |      THEN 1 ELSE 0 END AS j3
        |  FROM v
        |), r AS (
        |  SELECT doc_id, 1 AS jj, j1 AS vote FROM j
        |  UNION ALL SELECT doc_id, 2, j2 FROM j
        |  UNION ALL SELECT doc_id, 3, j3 FROM j
        |), kept AS (
        |  SELECT * FROM r WHERE ((doc_id + jj) % 7 + 7) % 7 <> 0
        |), u AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(vote) AS BIGINT) AS n1u
        |  FROM kept GROUP BY doc_id HAVING COUNT(*) >= 2
        |), agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
        |    CAST(SUM(m) AS BIGINT) AS n_dot,
        |    CAST(SUM(n1u) AS BIGINT) AS n_pos,
        |    CAST(SUM((2 * n1u * (m - n1u)) // (m - 1)) AS BIGINT) AS t
        |  FROM u
        |), f AS (
        |  SELECT *, (t * 1000000) // n_dot AS do_micro,
        |    (n_pos * 1000000) // n_dot AS p1
        |  FROM agg
        |), g AS (
        |  SELECT *,
        |    GREATEST((2 * p1 * (1000000 - p1)) // 1000000, 1)
        |      AS de_micro
        |  FROM f
        |), h AS (
        |  SELECT *, (do_micro * 1000000) // de_micro AS a,
        |    ((n_dot - 1) * 1000000) // n_dot AS corr
        |  FROM g)
        |SELECT n_units, n_dot, n_pos, do_micro, de_micro,
        |  1000000 - (a * corr) // 1000000000000 AS alpha_micro
        |FROM h""".stripMargin,
    "ev_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
        |    CAST(ROUND(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), mid AS (
        |  SELECT (MIN(hr) + MAX(hr)) // 2 AS mid FROM ev
        |), xy AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    CAST(SUM(CASE WHEN hr < mid THEN vm ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN hr >= mid THEN vm ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM ev CROSS JOIN mid GROUP BY user_id
        |), pooled AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM xy
        |), arms AS (
        |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_a,
        |    CAST(SUM(x) AS BIGINT) AS sx_a,
        |    CAST(SUM(y) AS BIGINT) AS sy_a,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx_a,
        |    CAST(SUM(y * y) AS BIGINT) AS syy_a,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy_a
        |  FROM xy GROUP BY arm
        |), f AS (
        |  SELECT *,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / GREATEST(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE),
        |      CAST(1 AS DOUBLE)) AS theta,
        |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
        |    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_y
        |  FROM arms CROSS JOIN pooled
        |), g AS (
        |  SELECT *,
        |    (CAST(sy_a AS DOUBLE) - theta * (CAST(sx_a AS DOUBLE)
        |      - CAST(n_a AS DOUBLE) * xbar)) / CAST(n_a AS DOUBLE)
        |      AS mean_cuped,
        |    CAST(syy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      - (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |      * (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS var_y
        |  FROM f
        |), h AS (
        |  SELECT *,
        |    var_y - 2.0 * theta * (CAST(sxy_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE) - (CAST(sx_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE)) * (CAST(sy_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE)))
        |      + theta * theta * (CAST(sxx_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE) - (CAST(sx_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE)) * (CAST(sx_a AS DOUBLE)
        |      / CAST(n_a AS DOUBLE))) AS var_cuped
        |  FROM g)
        |SELECT arm, n_a AS n_users,
        |  CAST(ROUND(theta * 1e6) AS BIGINT) AS theta_micro,
        |  CAST(ROUND(mean_y * 1e3) AS BIGINT) AS mean_y_milli,
        |  CAST(ROUND(mean_cuped * 1e3) AS BIGINT)
        |    AS mean_cuped_milli,
        |  CAST(ROUND((1.0 - var_cuped / GREATEST(var_y, 1.0)) * 1e6)
        |    AS BIGINT) AS var_reduction_micro
        |FROM h ORDER BY arm""".stripMargin,
    "graph_eff_diameter" ->
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
        |), uni AS (
        |  SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n_nodes FROM d1
        |), piv AS (
        |  SELECT id AS s FROM (SELECT DISTINCT u AS id FROM d1) n
        |  ORDER BY md5('btw:' || CAST(id AS VARCHAR)), id
        |  LIMIT 8
        |), l1 AS (
        |  SELECT p.s, d1.v FROM piv p JOIN d1 ON d1.u = p.s
        |), l2 AS (
        |  SELECT DISTINCT x.s, h.w AS v
        |  FROM l1 x JOIN hop h ON h.m = x.v
        |  WHERE h.w <> x.s
        |    AND NOT EXISTS (SELECT 1 FROM l1 z
        |      WHERE z.s = x.s AND z.v = h.w)
        |), l3 AS (
        |  SELECT DISTINCT x.s, h.w AS v
        |  FROM l2 x JOIN hop h ON h.m = x.v
        |  WHERE h.w <> x.s
        |    AND NOT EXISTS (SELECT 1 FROM l1 z
        |      WHERE z.s = x.s AND z.v = h.w)
        |    AND NOT EXISTS (SELECT 1 FROM l2 z
        |      WHERE z.s = x.s AND z.v = h.w)
        |), ring AS (
        |  SELECT 1 AS depth, s, v FROM l1
        |  UNION ALL SELECT 2, s, v FROM l2
        |  UNION ALL SELECT 3, s, v FROM l3
        |), cum AS (
        |  -- explicit 1..3 spine: an empty depth-3 ring still reports
        |  -- its cumulative (= depth-2) reach, matching the engine
        |  SELECT d.depth, r.s, CAST(COUNT(*) AS BIGINT) AS reached
        |  FROM (SELECT unnest(range(1, 4)) AS depth) d
        |  JOIN ring r ON r.depth <= d.depth
        |  GROUP BY d.depth, r.s
        |), fr AS (
        |  SELECT depth, s, reached,
        |    (reached * 1000000) // (n_nodes - 1) AS frac_micro,
        |    n_nodes
        |  FROM cum CROSS JOIN uni)
        |SELECT CAST(depth AS BIGINT) AS depth,
        |  CAST(COUNT(*) AS BIGINT) AS n_pivots,
        |  MAX(n_nodes) AS n_nodes,
        |  CAST(SUM(reached) AS BIGINT) AS sum_reached,
        |  CAST(SUM(frac_micro) AS BIGINT) // COUNT(*)
        |    AS mean_reach_micro
        |FROM fr GROUP BY depth
        |ORDER BY depth""").stripMargin,
  )
}
