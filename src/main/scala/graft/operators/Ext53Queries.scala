package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 16: exact spectral analysis on the integer lattice.
  *
  *  - `ts_hadamard_energy`: the Walsh–Hadamard transform of each
  *    event type's daily-sum series (32-point, zero-padded spine).
  *    WHT is the spectral transform that stays EXACT in integer
  *    arithmetic — coefficient c_k = Σ_t v_t·(−1)^popcount(t AND k)
  *    — so unlike a DFT it cross-checks bit-for-bit between engines
  *    while still exposing periodicity (sequency) structure; Parseval
  *    (Σc_k² = 32·Σv_t²) is asserted in the spec over BigInt.
  *  - `graph_power_partition`: spectral-flavored 2-way partition by
  *    three deterministic power iterations of (I + A) from the ±1
  *    parity vector, nodes split by the result's sign. Reports each
  *    side's size, volume, and internal edge count — from which the
  *    cut follows — the balanced-cut diagnostic that decides whether
  *    a near-dup component can be processed shard-local.
  *
  * 100 TB shapes: the WHT is a 32×|types| broadcast spine joined to
  * a per-(type, day) pre-aggregate — the transform's cost is the
  * pre-aggregate scan, the butterfly is constant; the power
  * iteration is 3 hash joins of the |V| score vector against the
  * adjacency (|E| rows per step, no fan-out) and one |V| argsign
  * rollup.
  */
object Ext53Queries {

  // ---------------------------------------------------------------
  // ts_hadamard_energy
  // ---------------------------------------------------------------

  private val HN = 32 // transform length (days span < 32)
  private val Day0 = 19723L

  def hadamardEnergy(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        (expr("cast(ts div 86400000000000 as bigint)") - Day0).as("tt"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .filter(col("tt") >= 0 && col("tt") < HN)
      .groupBy("event_type", "tt")
      .agg(sum("vm").as("v"))
    val ks = spark.range(HN).select(col("id").as("k"))
    daily.crossJoin(broadcast(ks))
      .withColumn("sign",
        when(expr("pmod(bit_count(tt & k), 2)") === 0, lit(1L))
          .otherwise(lit(-1L)))
      .groupBy("event_type", "k")
      .agg(sum(col("v") * col("sign")).as("coef"))
      .withColumn("abs_coef", abs(col("coef")))
      .orderBy("event_type", "k")
  }

  // ---------------------------------------------------------------
  // graph_power_partition
  // ---------------------------------------------------------------

  def powerPartition(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val und = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b"))).cache()
    val nodes = und.select(col("a").as("node")).distinct()
    var x = nodes.withColumn("x",
      when(pmod(col("node"), lit(2)) === 0, lit(1L)).otherwise(lit(-1L)))
    for (_ <- 1 to 3) {
      // (I + A)x: each step joins the score vector to the adjacency.
      // x feeds TWO consumers per step — cache every round or the
      // lineage re-evaluates 2^R times (the repo's iterative-loop
      // contract)
      x = x.cache()
      val nbrSum = und.join(x, und("b") === x("node"))
        .groupBy(und("a").as("node2"))
        .agg(sum("x").as("nx"))
      x = x.join(nbrSum, x("node") === nbrSum("node2"))
        .select(col("node"), (col("x") + col("nx")).as("x"))
    }
    val signed = x.withColumn("side",
      when(col("x") >= 0, lit(1L)).otherwise(lit(-1L)))
    val deg = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
    val internal = und
      .join(signed.select(col("node").as("a"), col("side").as("sa")), "a")
      .join(signed.select(col("node").as("b"), col("side").as("sb")), "b")
      .filter(col("sa") === col("sb"))
      .groupBy(col("sa").as("side"))
      .agg((count(lit(1)) / 2).cast("long").as("n_internal"))
    signed.join(deg, "node")
      .groupBy("side")
      .agg(count(lit(1)).as("n_nodes"), sum("deg").as("volume"))
      .join(internal, Seq("side"), "left")
      .na.fill(0L, Seq("n_internal"))
      .orderBy("side")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_hadamard_energy" -> hadamardEnergy _,
    "graph_power_partition" -> powerPartition _,
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
    "ts_hadamard_energy" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |    epoch_ns(ts) // 86400000000000 - $Day0 AS tt,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events
        |  WHERE epoch_ns(ts) // 86400000000000 - $Day0 >= 0
        |    AND epoch_ns(ts) // 86400000000000 - $Day0 < $HN
        |  GROUP BY 1, 2
        |), ks AS (SELECT unnest(range(0, $HN)) AS k)
        |SELECT d.event_type, CAST(ks.k AS BIGINT) AS k,
        |  CAST(SUM(d.v * CASE WHEN bit_count(d.tt & ks.k) % 2 = 0
        |    THEN 1 ELSE -1 END) AS BIGINT) AS coef,
        |  CAST(abs(SUM(d.v * CASE WHEN bit_count(d.tt & ks.k) % 2 = 0
        |    THEN 1 ELSE -1 END)) AS BIGINT) AS abs_coef
        |FROM daily d CROSS JOIN ks
        |GROUP BY d.event_type, ks.k
        |ORDER BY d.event_type, k""".stripMargin,
    "graph_power_partition" ->
      (simhashPairsCte + """, und AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
        |), x0 AS (
        |  SELECT DISTINCT a AS node,
        |    CASE WHEN a % 2 = 0 THEN CAST(1 AS BIGINT)
        |      ELSE CAST(-1 AS BIGINT) END AS x
        |  FROM und
        |), x1 AS (
        |  SELECT x.node, x.x + SUM(xb.x) AS x
        |  FROM x0 x JOIN und u ON u.a = x.node
        |  JOIN x0 xb ON xb.node = u.b
        |  GROUP BY x.node, x.x
        |), x2 AS (
        |  SELECT x.node, x.x + SUM(xb.x) AS x
        |  FROM x1 x JOIN und u ON u.a = x.node
        |  JOIN x1 xb ON xb.node = u.b
        |  GROUP BY x.node, x.x
        |), x3 AS (
        |  SELECT x.node, x.x + SUM(xb.x) AS x
        |  FROM x2 x JOIN und u ON u.a = x.node
        |  JOIN x2 xb ON xb.node = u.b
        |  GROUP BY x.node, x.x
        |), signed AS (
        |  SELECT node, CASE WHEN x >= 0 THEN CAST(1 AS BIGINT)
        |    ELSE CAST(-1 AS BIGINT) END AS side
        |  FROM x3
        |), deg AS (
        |  SELECT a AS node, CAST(count(*) AS BIGINT) AS deg
        |  FROM und GROUP BY a
        |), internal AS (
        |  SELECT sa.side, CAST(count(*) // 2 AS BIGINT) AS n_internal
        |  FROM und u
        |  JOIN signed sa ON sa.node = u.a
        |  JOIN signed sb ON sb.node = u.b
        |  WHERE sa.side = sb.side
        |  GROUP BY sa.side
        |)
        |SELECT s.side, CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(SUM(d.deg) AS BIGINT) AS volume,
        |  CAST(COALESCE(MAX(i.n_internal), 0) AS BIGINT) AS n_internal
        |FROM signed s
        |JOIN deg d ON d.node = s.node
        |LEFT JOIN internal i ON i.side = s.side
        |GROUP BY s.side
        |ORDER BY s.side""".stripMargin),
  )
}
