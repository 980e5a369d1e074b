package graft.operators

import java.util.concurrent.ConcurrentHashMap

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 13: storage-layout operators — hive-partitioned
  * sink with pruned read-back, bucketed co-located join — and one
  * deterministic Louvain local-moving round.
  *
  *  - `src_hive_partitioned`: writes the typed events projection
  *    `partitionBy(event_type, day)`, reads it back with a
  *    partition-column predicate, and aggregates. The DuckDB oracle
  *    computes the same aggregate straight from the parquet source,
  *    so the hash gate proves the partitioned roundtrip (including
  *    the value→directory→value partition-column round trip) is
  *    lossless; the spec asserts the scan's `PartitionFilters`
  *    actually pruned (6 of ~150 directories read).
  *  - `src_bucketed_join`: fact and dim written `bucketBy(8,
  *    user_id)` + `sortBy` as external tables, then merge-joined.
  *    Bucketing is THE 100 TB co-location tool: both sides land
  *    hash-distributed on the join key at write time, so the join
  *    plan has no shuffle at all — the spec asserts zero
  *    ShuffleExchange under the SortMergeJoin.
  *  - `graph_louvain_round`: one synchronous local-moving sweep of
  *    Louvain phase 1 over the simhash near-dup graph from singleton
  *    communities. The modularity gain comparison stays integer:
  *    moving i into C beats C' iff `k_iin·2m − deg_i·totC` is
  *    larger (the ΔQ numerator ×(2m)² — same order, no floats);
  *    ties break to the smallest community id, stay wins at ≤ 0.
  *
  * 100 TB shapes: partitioned writes turn low-cardinality
  * predicates into directory pruning (no file even opened); the
  * bucketed join eliminates both exchanges AND both sorts; the
  * Louvain sweep is two joins over the adjacency (labels, then
  * community totals) and one per-node argmax — |E| work per round.
  */
object Ext50Queries {

  private val written = new ConcurrentHashMap[String, String]()

  private def tmpPath(tag: String, dir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft-$tag-${ProcessHandle.current().pid()}-" +
        Integer.toHexString(dir.hashCode)).toString

  // ---------------------------------------------------------------
  // src_hive_partitioned
  // ---------------------------------------------------------------

  private def eventsTyped(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").select(
      col("user_id"),
      expr("cast(round(value * 1000) as bigint)").as("vm"),
      col("event_type"),
      expr("cast(ts div 86400000000000 as bigint)").as("day"))

  def hivePartitioned(spark: SparkSession, dir: String): DataFrame = {
    val path = written.computeIfAbsent(s"hivepart:$dir", _ => {
      val p = tmpPath("hivepart", dir)
      eventsTyped(spark, dir).write.mode("overwrite")
        .partitionBy("event_type", "day").parquet(p)
      p
    })
    spark.read.parquet(path)
      .filter(col("event_type") === "purchase"
        && col("day").between(19725, 19730))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"), sum("vm").as("s_milli"),
        countDistinct("user_id").as("n_users"))
      .orderBy("day")
      // partition columns come back as read-schema types; pin them
      .select(col("event_type"), col("day").cast("long").as("day"),
        col("n"), col("s_milli"), col("n_users"))
  }

  // ---------------------------------------------------------------
  // src_bucketed_join
  // ---------------------------------------------------------------

  /** Register fact+dim as bucketed external tables once per JVM;
    * returns (factTable, dimTable) catalog names.
    */
  def bucketedTables(spark: SparkSession, dir: String): (String, String) = {
    val tag = Integer.toHexString(dir.hashCode)
    val (fact, dim) = (s"graft_bk_fact_$tag", s"graft_bk_dim_$tag")
    written.computeIfAbsent(s"bucketed:$dir", _ => {
      eventsTyped(spark, dir).select("user_id", "vm", "event_type")
        .write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", tmpPath("bkfact", dir))
        .saveAsTable(fact)
      eventsTyped(spark, dir)
        .groupBy("user_id")
        .agg(min("day").as("first_day"), count(lit(1)).as("n_total"))
        .write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .option("path", tmpPath("bkdim", dir))
        .saveAsTable(dim)
      "done"
    })
    (fact, dim)
  }

  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (fact, dim) = bucketedTables(spark, dir)
    val purchases = spark.table(fact)
      .filter(col("event_type") === "purchase")
    purchases.hint("merge")
      .join(spark.table(dim).hint("merge"), "user_id")
      .groupBy("user_id", "first_day", "n_total")
      .agg(count(lit(1)).as("n_purch"), sum("vm").as("s_milli"))
      .orderBy("user_id")
      .select("user_id", "first_day", "n_total", "n_purch", "s_milli")
  }

  // ---------------------------------------------------------------
  // graph_louvain_round
  // ---------------------------------------------------------------

  def louvainRound(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val und = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b"))).cache()
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
    val m2 = broadcast(und.agg(count(lit(1)).as("m2")))
    // singleton init: node j's community IS j, tot(C_j) = deg(j)
    val cands = und
      .groupBy(col("a").as("node"), col("b").as("c"))
      .agg(count(lit(1)).as("k_iin")) // parallel edges impossible; 1
      .join(deg.select(col("a").as("node"), col("deg").as("deg_i")),
        "node")
      .join(deg.select(col("a").as("c"), col("deg").as("tot_c")), "c")
      .crossJoin(m2)
      .select(col("node"), col("c"),
        (col("k_iin") * col("m2") - col("deg_i") * col("tot_c"))
          .as("score"))
    val stay = deg.select(col("a").as("node"), col("a").as("c"),
      lit(0L).as("score"))
    val w = Window.partitionBy("node")
      .orderBy(col("score").desc, col("c"))
    val labels = cands.unionByName(stay)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("node"), col("c").as("label"))
    labels.groupBy("label")
      .agg(count(lit(1)).as("n_members"),
        sum(when(col("node") =!= col("label"), 1L).otherwise(0L))
          .as("n_joined"))
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_hive_partitioned" -> hivePartitioned _,
    "src_bucketed_join" -> bucketedJoin _,
    "graph_louvain_round" -> louvainRound _,
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
    "src_hive_partitioned" ->
      """SELECT event_type,
        |  CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |    AS s_milli,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events
        |WHERE event_type = 'purchase'
        |  AND epoch_ns(ts) // 86400000000000 BETWEEN 19725 AND 19730
        |GROUP BY 1, 2
        |ORDER BY day""".stripMargin,
    "src_bucketed_join" ->
      """WITH dim AS (
        |  SELECT user_id,
        |    CAST(min(epoch_ns(ts) // 86400000000000) AS BIGINT)
        |      AS first_day,
        |    CAST(count(*) AS BIGINT) AS n_total
        |  FROM events GROUP BY user_id
        |)
        |SELECT e.user_id, d.first_day, d.n_total,
        |  CAST(count(*) AS BIGINT) AS n_purch,
        |  CAST(sum(CAST(round(e.value * 1000) AS BIGINT)) AS BIGINT)
        |    AS s_milli
        |FROM events e JOIN dim d ON d.user_id = e.user_id
        |WHERE e.event_type = 'purchase'
        |GROUP BY e.user_id, d.first_day, d.n_total
        |ORDER BY e.user_id""".stripMargin,
    "graph_louvain_round" ->
      (simhashPairsCte + """, und AS (
        |  SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs
        |), deg AS (
        |  SELECT a, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY a
        |), m2 AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM und),
        |cands AS (
        |  SELECT u.a AS node, u.b AS c,
        |    CAST(count(*) AS BIGINT) * m2.m2
        |      - di.deg * dc.deg AS score
        |  FROM und u
        |  JOIN deg di ON di.a = u.a
        |  JOIN deg dc ON dc.a = u.b
        |  CROSS JOIN m2
        |  GROUP BY u.a, u.b, m2.m2, di.deg, dc.deg
        |), allc AS (
        |  SELECT node, c, score FROM cands
        |  UNION ALL
        |  SELECT a, a, CAST(0 AS BIGINT) FROM deg
        |), labels AS (
        |  SELECT node, c AS label
        |  FROM (SELECT node, c,
        |      row_number() OVER (PARTITION BY node
        |        ORDER BY score DESC, c) AS rk
        |    FROM allc)
        |  WHERE rk = 1
        |)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(SUM(CASE WHEN node <> label THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_joined
        |FROM labels GROUP BY label
        |ORDER BY label""".stripMargin),
  )
}
