package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 10: modern aggregate surface, deterministic graph
  * walks, and windowed co-occurrence mining.
  *
  *  - `q79_modern_aggs`: the post-2020 aggregate surface in one
  *    query — `count_if`, `bool_and`/`bool_or`, `max_by`/`min_by`
  *    (keyed by the UNIQUE sequence column, so ties cannot make the
  *    result engine-dependent) — the idioms that replace
  *    SUM(CASE WHEN ...) boilerplate.
  *  - `graph_random_walks`: seeded DETERMINISTIC random walks over
  *    the simhash near-dup graph (4 steps, neighbor picked by
  *    md5(seed, node, step) over the id-ranked adjacency) — the
  *    DeepWalk/node2vec corpus generator: at 100 TB this emits the
  *    training sequences a graph-embedding job consumes, and
  *    determinism is what makes the corpus reproducible run-over-run.
  *  - `text_window_cooccur`: ±2-token window co-occurrence with a
  *    PMI-ordered report (the word2vec-era association miner) —
  *    lift stays on the integer lattice as the ratio
  *    n_ab·N / (n_a·n_b) in micro units instead of its log.
  *
  * 100 TB shapes: modern aggs are one map-side-combined rollup; the
  * walks are 4 hash joins against the id-ranked adjacency (each step
  * is |nodes| rows — never fan-out); co-occurrence explodes ±2
  * offsets per token (bounded), aggregates (a, b) pairs with
  * map-side combine, and takes the report via a bounded top-k.
  */
object Ext47Queries {

  // ---------------------------------------------------------------
  // q79_modern_aggs
  // ---------------------------------------------------------------

  def modernAggs(spark: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count_if(CAST(round(value * 1000) AS BIGINT) >= 250000)
        |    AS BIGINT) AS n_high,
        |  bool_and(value > 0) AS all_positive,
        |  bool_or(CAST(round(value * 1000) AS BIGINT) >= 489000)
        |    AS any_near_max,
        |  CAST(max_by(CAST(round(value * 1000) AS BIGINT), event_id)
        |    AS BIGINT) AS last_vm,
        |  CAST(min_by(CAST(round(value * 1000) AS BIGINT), event_id)
        |    AS BIGINT) AS first_vm
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
  }

  // ---------------------------------------------------------------
  // graph_random_walks
  // ---------------------------------------------------------------

  private val WalkSteps = 4

  /** hash(seed, node, step) in [0, 2^12) via md5 hex arithmetic —
    * strpos form so the oracle mirrors it digit-exact.
    */
  private def pick(node: org.apache.spark.sql.Column, step: Int) = {
    val h = md5(concat(lit("walk7:"), node.cast("string"),
      lit(s":$step")))
    def hx(p: Int) =
      (instr(lit("0123456789abcdef"), substring(h, p, 1)) - 1)
        .cast("long")
    hx(1) * 256 + hx(2) * 16 + hx(3)
  }

  def randomWalks(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val und = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b")))
    // id-ranked adjacency: (node, idx, neighbor, deg)
    val wAdj = Window.partitionBy("a").orderBy("b")
    val adj = und
      .withColumn("idx", row_number().over(wAdj).cast("long") - 1)
      .withColumn("deg", count(lit(1)).over(
        Window.partitionBy("a")))
      .select(col("a").as("node"), col("idx"), col("b").as("nbr"),
        col("deg"))
      .cache()
    // every round's frontier has TWO consumers (the next step's join
    // and the `frames` buffer) — cache each one, like the other
    // iterative loops (Ext53/57/58), so lineage is O(1) per step
    // instead of the adjacency join re-evaluating up to 2^steps times
    var cur = adj.select(col("node").as("walk_id")).distinct()
      .withColumn("node", col("walk_id"))
      .cache()
    val frames = scala.collection.mutable.Buffer(
      cur.select(col("walk_id"), lit(0L).as("step"), col("node")))
    for (s <- 1 to WalkSteps) {
      // each step is one equi-join against the cached id-ranked
      // adjacency, filtered to the hash-chosen neighbor index —
      // |walks| rows in, |walks| rows out, never a fan-out
      cur = cur.join(adj, Seq("node"))
        .filter(col("idx") === pick(col("node"), s) % col("deg"))
        .select(col("walk_id"), col("nbr").as("node"))
        .cache()
      frames += cur.select(col("walk_id"), lit(s.toLong).as("step"),
        col("node"))
    }
    frames.reduce(_.unionByName(_)).orderBy("walk_id", "step")
  }

  // ---------------------------------------------------------------
  // text_window_cooccur
  // ---------------------------------------------------------------

  def windowCooccur(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        lower(col("col")).as("w"))
    val total = broadcast(tok.agg(count(lit(1)).as("total")))
    // EQUI-join on (doc, target position) after a bounded ±offset
    // explode — never the doc_id-only self-join, whose per-doc
    // fan-out is |tokens|² before the window filter
    val probes = tok.select(col("doc_id"), col("w"),
      explode(array(col("pos") + 1, col("pos") + 2)).as("pos2"))
    val pairs = probes
      .join(tok.select(col("doc_id"), col("pos").as("pos2"),
        col("w").as("w2")), Seq("doc_id", "pos2"))
      .select(
        least(col("w"), col("w2")).as("a"),
        greatest(col("w"), col("w2")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val uni = tok.groupBy("w").agg(count(lit(1)).as("n_w"))
    pairs
      .join(uni.select(col("w").as("a"), col("n_w").as("n_a")), "a")
      .join(uni.select(col("w").as("b"), col("n_w").as("n_b")), "b")
      .filter(col("n_ab") >= 5)
      .crossJoin(total)
      .withColumn("lift_micro",
        expr("n_ab * total * 1000000 div (n_a * n_b)"))
      .orderBy(col("lift_micro").desc, col("a"), col("b"))
      .limit(50)
      .select("a", "b", "n_ab", "n_a", "n_b", "lift_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_modern_aggs" -> modernAggs _,
    "graph_random_walks" -> randomWalks _,
    "text_window_cooccur" -> windowCooccur _,
  )

  /** Shared simhash pairs CTE (dedup_simhash_pairs through `pairs`). */
  private val simhashPairsCte: String =
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

  private def walkStepSql(s: Int): String =
    s""", w$s AS (
       |  SELECT w.walk_id, a.nbr AS node
       |  FROM w${s - 1} w
       |  JOIN adj a ON a.node = w.node AND a.idx = (
       |    (strpos('0123456789abcdef', substr(
       |       md5('walk7:' || CAST(w.node AS VARCHAR) || ':$s'),
       |       1, 1)) - 1) * 256
       |    + (strpos('0123456789abcdef', substr(
       |       md5('walk7:' || CAST(w.node AS VARCHAR) || ':$s'),
       |       2, 1)) - 1) * 16
       |    + (strpos('0123456789abcdef', substr(
       |       md5('walk7:' || CAST(w.node AS VARCHAR) || ':$s'),
       |       3, 1)) - 1)) % a.deg
       |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q79_modern_aggs" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count_if(CAST(round(value * 1000) AS BIGINT) >= 250000)
        |    AS BIGINT) AS n_high,
        |  bool_and(value > 0) AS all_positive,
        |  bool_or(CAST(round(value * 1000) AS BIGINT) >= 489000)
        |    AS any_near_max,
        |  CAST(max_by(CAST(round(value * 1000) AS BIGINT), event_id)
        |    AS BIGINT) AS last_vm,
        |  CAST(min_by(CAST(round(value * 1000) AS BIGINT), event_id)
        |    AS BIGINT) AS first_vm
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "graph_random_walks" ->
      (simhashPairsCte + """, und AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
        |), adj AS (
        |  SELECT a AS node,
        |    CAST(row_number() OVER (PARTITION BY a ORDER BY b)
        |      AS BIGINT) - 1 AS idx,
        |    b AS nbr,
        |    CAST(count(*) OVER (PARTITION BY a) AS BIGINT) AS deg
        |  FROM und
        |), w0 AS (
        |  SELECT DISTINCT node AS walk_id, node FROM adj
        |)""".stripMargin +
        (1 to 4).map(walkStepSql).mkString +
        """
        |SELECT walk_id, CAST(0 AS BIGINT) AS step, node FROM w0
        |UNION ALL SELECT walk_id, 1, node FROM w1
        |UNION ALL SELECT walk_id, 2, node FROM w2
        |UNION ALL SELECT walk_id, 3, node FROM w3
        |UNION ALL SELECT walk_id, 4, node FROM w4
        |ORDER BY walk_id, step""".stripMargin),
    "text_window_cooccur" ->
      """WITH tok AS (
        |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, lower(tk[i]) AS w
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(text), '\s+') AS tk
        |        FROM documents),
        |    UNNEST(range(1, len(tk) + 1)) AS r(i)
        |), n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok),
        |pairs AS (
        |  SELECT least(x.w, y.w) AS a, greatest(x.w, y.w) AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM tok x JOIN tok y ON y.doc_id = x.doc_id
        |    AND y.pos > x.pos AND y.pos <= x.pos + 2
        |  GROUP BY 1, 2
        |), uni AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM tok
        |  GROUP BY w)
        |SELECT p.a, p.b, p.n_ab, ua.n_w AS n_a, ub.n_w AS n_b,
        |  CAST(p.n_ab * n.total * 1000000 // (ua.n_w * ub.n_w)
        |    AS BIGINT) AS lift_micro
        |FROM pairs p
        |JOIN uni ua ON ua.w = p.a
        |JOIN uni ub ON ub.w = p.b
        |CROSS JOIN n
        |WHERE p.n_ab >= 5
        |ORDER BY lift_micro DESC, p.a, p.b
        |LIMIT 50""".stripMargin,
  )
}
