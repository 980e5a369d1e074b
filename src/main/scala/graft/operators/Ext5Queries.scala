package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 batch: training-data assembly operators — Dolma-style
  * paragraph-level exact dedup with document reassembly, a
  * fixed-iteration all-integer PageRank over the customer–supplier
  * interaction graph, and temperature-weighted data-mixing allocation
  * with largest-remainder rounding. Every query is hash-exact against
  * a DuckDB oracle; the numeric recurrences are kept in integer units
  * so no cross-engine float-summation order can break the hash.
  */
object Ext5Queries {

  /** Paragraph-level exact dedup (the Dolma/CCNet shape): explode
    * documents into paragraph units, give each distinct paragraph to
    * its single global first occurrence (min (doc_id, position)),
    * drop every other copy, and reassemble each document from its
    * surviving paragraphs in original order. The fixture text has no
    * newlines, so the unit here is a fixed 10-token pseudo-paragraph;
    * on real data the split expression is the paragraph delimiter —
    * the operator shape (explode -> window-owner -> ordered
    * reassembly) is identical. Scale: one shuffle on paragraph hash
    * (the owner window) + one shuffle back on doc_id; paragraph text
    * never leaves the row it was exploded from except as its md5.
    */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame = {
    val segLen = 10
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tk"))
      .withColumn("n_seg",
        ceil(size(col("tk")) / lit(segLen.toDouble)).cast("int"))
    val segs = docs
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_seg") - 1)).as("seg_idx"),
        col("tk"))
      .withColumn("seg_text",
        concat_ws(" ", slice(col("tk"), col("seg_idx") * segLen + 1,
          lit(segLen))))
      .withColumn("seg_hash", md5(col("seg_text")))
      .drop("tk")
    val owner = Window.partitionBy(col("seg_hash"))
      .orderBy(col("doc_id"), col("seg_idx"))
    segs
      .withColumn("keep", row_number().over(owner) === 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("seg_idx"), col("seg_text"))))),
            x => x.getField("seg_text")))).as("kept_hash"))
      .orderBy("doc_id")
  }

  /** Fixed-iteration PageRank over the customer–supplier interaction
    * graph (an edge per distinct (custkey, suppkey) pair that traded,
    * both directions so every node has out-degree). Three damped
    * iterations entirely in integer micro-units: each node's share is
    * `rank div degree`, and the update is
    * `r' = (15*S) div (100*N) + (85 * sum_in) div 100` — integer
    * division in both engines, so the recurrence is hash-exact with
    * no float summation anywhere. Scale: the edge list is
    * hash-partitioned on dst and each iteration is one shuffle join +
    * one aggregation; ranks are a small (node-count) table that AQE
    * broadcasts, and a production loop checkpoints every few
    * iterations to cut lineage (documented in SCALE.md).
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val scale = 1000000L
    val edgesOneWay = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(t(spark, dir, "lineitem").select(col("l_orderkey"),
        col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    // cache(), deliberately: the edge list is re-read by every
    // iteration's join. CacheManager keys entries by canonicalized
    // plan, so repeated constructions of this query reuse ONE entry
    // (no accumulation across specs/audits/bench warmups) and the
    // bench's between-query clearCache releases it.
    val edges = edgesOneWay.select(col("cust").as("src"),
        col("supp").as("dst"))
      .unionAll(edgesOneWay.select(col("supp").as("src"),
        col("cust").as("dst")))
      .cache()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // node count stays IN the plan (whole-set window over the small
    // node table, same pattern as mixAllocation) — a driver-side
    // deg.count() here would run a full scan+shuffle job during
    // DataFrame CONSTRUCTION, breaking the lazy-construction contract
    // plan sweeps/audits rely on
    var ranks = deg
      .withColumn("n_nodes",
        count(lit(1)).over(Window.partitionBy()))
      .select(col("src").as("node"), col("deg"), col("n_nodes"),
        expr(s"$scale div n_nodes").as("rank"))
    for (_ <- 1 to 3) {
      val contrib = ranks
        .select(col("node"), expr("rank div deg").as("share"))
        .join(edges, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("share")).as("sum_in"))
      ranks = ranks.drop("rank")
        .join(contrib, col("node") === col("dst"), "left")
        .select(col("node"), col("deg"), col("n_nodes"),
          (expr(s"(15 * $scale) div (100 * n_nodes)") +
            expr("85 * coalesce(sum_in, 0L) div 100"))
            .as("rank"))
    }
    ranks
      .select(col("node"),
        when(col("node") >= 1000000L, "supplier").otherwise("customer")
          .as("kind"),
        col("deg"), col("rank").as("rank_micro"))
      .orderBy("node")
  }

  /** Data-mixing allocation: distribute a 300-document sampling
    * budget across sources proportionally to temperature-flattened
    * weight (sqrt of token count — alpha=0.5), rounded exactly to the
    * budget with largest-remainder apportionment. Integer weights
    * (round(sqrt*1000)) keep the shares exact across engines; the
    * whole query runs on one tiny per-source aggregate, so at 100 TB
    * it is a metadata-size computation after a single pre-aggregation
    * pass — the per-document keep decision then reuses the
    * deterministic md5-threshold sampler (text_stratified_sample).
    */
  def mixAllocation(spark: SparkSession, dir: String): DataFrame = {
    val budget = 300L
    val perSrc = t(spark, dir, "documents")
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_cnt"))
      .withColumn("w",
        round(sqrt(col("tok_cnt")) * 1000).cast("long"))
    val all = Window.partitionBy()
    val ranked = perSrc
      .withColumn("sum_w", sum(col("w")).over(all))
      .withColumn("alloc_base", expr(s"($budget * w) div sum_w"))
      .withColumn("rem", expr(s"($budget * w) % sum_w"))
      .withColumn("leftover",
        lit(budget) - sum(col("alloc_base")).over(all))
      .withColumn("rk", row_number().over(
        Window.partitionBy().orderBy(col("rem").desc, col("source"))))
    ranked
      .select(col("source"), col("n_docs"), col("tok_cnt"), col("w"),
        (col("alloc_base") +
          when(col("rk") <= col("leftover"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_paragraphs" -> paragraphDedup _,
    "graph_pagerank" -> pageRank _,
    "text_mix_allocation" -> mixAllocation _)

  val oracle: Map[String, String] = Map(
    "dedup_paragraphs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), segs AS (
        |  SELECT doc_id, CAST(i AS INT) AS seg_idx,
        |    array_to_string(
        |      list_slice(tk, i * 10 + 1,
        |        least(i * 10 + 10, len(tk))), ' ') AS seg_text
        |  FROM toks,
        |    UNNEST(range(0, CAST(ceil(len(tk) / 10.0) AS INT))) AS r(i)
        |), owned AS (
        |  SELECT doc_id, seg_idx, seg_text,
        |    ROW_NUMBER() OVER (PARTITION BY md5(seg_text)
        |      ORDER BY doc_id, seg_idx) = 1 AS keep
        |  FROM segs)
        |SELECT doc_id,
        |  COUNT(*) AS n_paras,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  md5(COALESCE(string_agg(seg_text, ' ' ORDER BY seg_idx)
        |    FILTER (WHERE keep), '')) AS kept_hash
        |FROM owned
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,
    "graph_pagerank" ->
      """WITH one AS (
        |  SELECT DISTINCT o.o_custkey AS cust,
        |    l.l_suppkey + 1000000 AS supp
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |), edges AS (
        |  SELECT cust AS src, supp AS dst FROM one
        |  UNION ALL
        |  SELECT supp AS src, cust AS dst FROM one
        |), deg AS (
        |  SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src
        |), n AS (SELECT COUNT(*) AS nn FROM deg),
        |r0 AS (
        |  SELECT node, deg, 1000000 // nn AS rank FROM deg, n
        |), i1 AS (
        |  SELECT d.node, d.deg,
        |    (15 * 1000000) // (100 * n.nn)
        |      + (85 * COALESCE(s.sum_in, 0)) // 100 AS rank
        |  FROM deg d CROSS JOIN n
        |  LEFT JOIN (
        |    SELECT e.dst, CAST(SUM(r.rank // r.deg) AS BIGINT) AS sum_in
        |    FROM r0 r JOIN edges e ON e.src = r.node GROUP BY e.dst
        |  ) s ON s.dst = d.node
        |), i2 AS (
        |  SELECT d.node, d.deg,
        |    (15 * 1000000) // (100 * n.nn)
        |      + (85 * COALESCE(s.sum_in, 0)) // 100 AS rank
        |  FROM deg d CROSS JOIN n
        |  LEFT JOIN (
        |    SELECT e.dst, CAST(SUM(r.rank // r.deg) AS BIGINT) AS sum_in
        |    FROM i1 r JOIN edges e ON e.src = r.node GROUP BY e.dst
        |  ) s ON s.dst = d.node
        |), i3 AS (
        |  SELECT d.node, d.deg,
        |    (15 * 1000000) // (100 * n.nn)
        |      + (85 * COALESCE(s.sum_in, 0)) // 100 AS rank
        |  FROM deg d CROSS JOIN n
        |  LEFT JOIN (
        |    SELECT e.dst, CAST(SUM(r.rank // r.deg) AS BIGINT) AS sum_in
        |    FROM i2 r JOIN edges e ON e.src = r.node GROUP BY e.dst
        |  ) s ON s.dst = d.node)
        |SELECT node,
        |  CASE WHEN node >= 1000000 THEN 'supplier' ELSE 'customer' END
        |    AS kind,
        |  deg, rank AS rank_micro
        |FROM i3
        |ORDER BY node""".stripMargin,
    "text_mix_allocation" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split_regex(trim(text), '\s+')))
        |      AS BIGINT) AS tok_cnt
        |  FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, n_docs, tok_cnt,
        |    CAST(round(sqrt(tok_cnt) * 1000) AS BIGINT) AS w
        |  FROM per
        |), sh AS (
        |  SELECT source, n_docs, tok_cnt, w,
        |    (300 * w) // CAST(SUM(w) OVER () AS BIGINT) AS alloc_base,
        |    (300 * w) % CAST(SUM(w) OVER () AS BIGINT) AS rem
        |  FROM w
        |), rk AS (
        |  SELECT *,
        |    300 - CAST(SUM(alloc_base) OVER () AS BIGINT) AS leftover,
        |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM sh)
        |SELECT source, n_docs, tok_cnt, w,
        |  alloc_base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS alloc
        |FROM rk
        |ORDER BY source""".stripMargin)
}
