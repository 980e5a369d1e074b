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
    val b = spark.sql(
      """SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS b1,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS b2,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS b3
        |FROM orders""".stripMargin).head
    val (b1, b2, b3) = (b.getDouble(0), b.getDouble(1), b.getDouble(2))
    t(spark, dir, "orders")
      .withColumn("part",
        when(col("o_totalprice") <= b1, 0)
          .when(col("o_totalprice") <= b2, 1)
          .when(col("o_totalprice") <= b3, 2)
          .otherwise(3))
      .groupBy(col("part"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"))
      .orderBy("part")
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

  /** Near-dup graph triangle audit: per-node triangle counts over the
    * simhash Hamming-pair graph — the density diagnostic that tells a
    * dedup pipeline whether its near-dup clusters are tight cliques
    * (safe to collapse to one canonical doc) or loose chains
    * (transitive merging would over-delete). One triangle enumeration
    * = two self-joins of the (already banded, already pruned) pair
    * list, each on a single node column — the standard distributed
    * triangle count; at 100 TB order the edge list by degree first so
    * every triangle is enumerated exactly once from its lowest-degree
    * corner (here a < b < c ids give the same uniqueness).
    */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val e = Dedup.simhashNearDups(t(spark, dir, "documents"),
        "doc_id", "text", maxHamming = 3)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val tri = e
      .join(e.select(col("a").as("b2"), col("b").as("c")),
        col("b") === col("b2"))
      .join(e.select(col("a").as("a3"), col("b").as("c3")),
        col("a") === col("a3") && col("c") === col("c3"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy("node")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_rangeparts" -> rangeParts _,
    "text_shuffle_shards" -> shuffleShards _,
    "graph_triangles" -> graphTriangles _)

  val oracle: Map[String, String] = Map(
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
        |  FROM tokrows, UNNEST(range(0, 32)) AS b(bit)
        |  GROUP BY id, bit
        |), fps AS (
        |  SELECT id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (31 - bit)
        |        ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY id
        |), pairs AS (
        |  SELECT a.id AS a, b.id AS b
        |  FROM fps a JOIN fps b ON a.id < b.id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 3
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
