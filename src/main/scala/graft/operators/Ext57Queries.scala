package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 20: CDC bootstrap-then-tail switchover and
  * truncated Katz centrality.
  *
  *  - `cdc_bootstrap_tail`: the CDC onboarding protocol — a new
  *    consumer bootstraps from a snapshot at sequence S (the LWW
  *    state over everything ≤ S), then tails the changelog from
  *    S+1. The query executes the TWO-PHASE path (bootstrap state ∪
  *    tail rows, re-merged); the oracle computes the ONE-PHASE
  *    answer (LWW over the whole log) — hash equality proves the
  *    switchover loses nothing and duplicates nothing, the property
  *    that makes zero-downtime consumer onboarding safe. S is
  *    data-derived (60% of max sequence) so every SF exercises a
  *    non-trivial split.
  *  - `graph_katz3`: Katz centrality truncated at path length 3
  *    with attenuation β = 1/4, computed exactly as the integer
  *    16·(A·1) + 4·(A²·1) + (A³·1) — walks weighted by decaying
  *    length, the centrality that (unlike degree) credits a node
  *    for its neighborhood's connectivity. Top-30 with total-order
  *    tiebreak.
  *
  * 100 TB shapes: the bootstrap state is |keys| rows, the tail is
  * the delta — the union re-merge shuffles |keys| + |delta|, never
  * the historical log twice; Katz is three |E| hash joins of the
  * score vector against the adjacency with per-round caches.
  */
object Ext57Queries {

  // ---------------------------------------------------------------
  // cdc_bootstrap_tail
  // ---------------------------------------------------------------

  def bootstrapTail(spark: SparkSession, dir: String): DataFrame = {
    val parsed = CdcQueries.parsedStored(spark, dir)
      .filter(col("op").isin("update", "update_newimage", "erase"))
    val cut = broadcast(parsed.agg(
      expr("max(event_id) * 3 div 5").as("s")))
    val withCut = parsed.crossJoin(cut)
    val wU = Window.partitionBy("user_id").orderBy(col("event_id").desc)
    // phase 1: snapshot state at S — one row per key, erases kept so
    // the tail knows the key existed (dropped only at final read)
    val boot = withCut.filter(col("event_id") <= col("s"))
      .withColumn("rn", row_number().over(wU))
      .filter(col("rn") === 1)
      .select("event_id", "op", "user_id", "event_type", "value_milli")
    // phase 2: tail from S+1, applied ON TOP of the bootstrap state
    val tail = withCut.filter(col("event_id") > col("s"))
      .select("event_id", "op", "user_id", "event_type", "value_milli")
    boot.unionByName(tail)
      .withColumn("rn", row_number().over(wU))
      .filter(col("rn") === 1 && col("op") =!= "erase")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type"), col("value_milli"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------
  // graph_katz3
  // ---------------------------------------------------------------

  def katz3(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val und = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b"))).cache()
    var p = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("p")).cache() // A·1 = degree
    val walks = scala.collection.mutable.Buffer(p)
    for (_ <- 2 to 3) {
      p = und.join(p, und("b") === p("node"))
        .groupBy(und("a").as("node"))
        .agg(sum("p").as("p")).cache()
      walks += p
    }
    val scored = walks(0).select(col("node"), (col("p") * 16).as("w"))
      .unionByName(walks(1).select(col("node"), (col("p") * 4).as("w")))
      .unionByName(walks(2).select(col("node"), col("p").as("w")))
      .groupBy("node").agg(sum("w").as("katz16"))
    scored.orderBy(col("katz16").desc, col("node")).limit(30)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_bootstrap_tail" -> bootstrapTail _,
    "graph_katz3" -> katz3 _,
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

  val oracle: Map[String, String] = Map(
    // ONE-PHASE LWW — equality proves two-phase switchover exactness
    "cdc_bootstrap_tail" -> (CdcQueries.baseCtePublic +
      """, app AS (
        |  SELECT * FROM typed
        |  WHERE op IN ('update', 'update_newimage', 'erase')
        |), lww AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn
        |  FROM app)
        |SELECT user_id, event_id AS last_event_id, event_type,
        |  value_milli
        |FROM lww WHERE rn = 1 AND op <> 'erase'
        |ORDER BY user_id""".stripMargin),
    "graph_katz3" ->
      (simhashPairsCte + """, und AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
        |), p1 AS (
        |  SELECT a AS node, CAST(count(*) AS BIGINT) AS p
        |  FROM und GROUP BY a
        |), p2 AS (
        |  SELECT u.a AS node, CAST(SUM(p.p) AS BIGINT) AS p
        |  FROM und u JOIN p1 p ON p.node = u.b GROUP BY u.a
        |), p3 AS (
        |  SELECT u.a AS node, CAST(SUM(p.p) AS BIGINT) AS p
        |  FROM und u JOIN p2 p ON p.node = u.b GROUP BY u.a
        |), scored AS (
        |  SELECT node, CAST(SUM(w) AS BIGINT) AS katz16 FROM (
        |    SELECT node, p * 16 AS w FROM p1
        |    UNION ALL SELECT node, p * 4 FROM p2
        |    UNION ALL SELECT node, p FROM p3)
        |  GROUP BY node)
        |SELECT node, katz16 FROM scored
        |ORDER BY katz16 DESC, node LIMIT 30""".stripMargin),
  )
}
