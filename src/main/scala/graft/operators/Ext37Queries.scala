package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 11: vocabulary economics, arrival-order hygiene,
  * and community quality.
  *
  *  - `tok_oov_curve`: OOV (out-of-vocabulary) rate vs vocabulary
  *    size — with the vocab = top-K tokens by corpus frequency
  *    (deterministic (freq desc, token) ranking), what fraction of
  *    token OCCURRENCES falls outside, for K ∈ {50,100,200}? The
  *    curve that sizes a tokenizer's word-level vocab; one frequency
  *    aggregate + a 3-row spine, never a per-K rescan.
  *  - `cdc_order_inversions`: per-partition arrival-order audit —
  *    adjacent event-time inversions against the sequence order
  *    (event_id), i.e. how often does the topic deliver out of
  *    event-time order. The number that decides watermark delay and
  *    whether the LWW merge can trust sequence order. One lag window
  *    per partition.
  *  - `graph_conductance`: per-community conductance of the LPA
  *    partition over the customer–supplier graph — cut edges /
  *    min(vol, vol_rest) per community. Completes the community
  *    toolkit: LPA PRODUCES a partition, modularity scores it
  *    globally, conductance localizes the weak communities. (CC
  *    labels would be the wrong input: components are closed under
  *    the edge relation, so their cut is identically zero.)
  *
  * 100 TB shapes: the OOV curve is two hash aggregates + a vocab-
  * sized semi-join; inversions are one narrow lag window per
  * partition key; conductance reads the stored pair graph + labels
  * (Derived) and aggregates edge endpoints — label-table-sized.
  */
object Ext37Queries {

  // ---------------------------------------------------------------
  // tok_oov_curve
  // ---------------------------------------------------------------

  def oovCurve(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(lower(col("tok")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("n")).cache()
    val ks = Seq(50L, 100L, 200L)
    val kMax = ks.max.toInt
    // sort-limit FIRST (TakeOrderedAndProject, per-partition heaps),
    // then rank only the kMax survivors — ranking the whole vocab in
    // one global window task was the r7-verdict-ask-#4 shape; the
    // OOV tail falls out of the 1-row totals by complement
    // (oov_occ = total − in-vocab, oov_types = total − min(k, total))
    val wRank = Window.orderBy(col("n").desc, col("tok"))
    val top = freq.orderBy(col("n").desc, col("tok")).limit(kMax)
      .withColumn("rk", row_number().over(wRank))
    val spine = broadcast(spark.range(1)
      .select(explode(array(ks.map(lit): _*)).as("k")))
    val tot = broadcast(freq.agg(sum("n").as("total_occ"),
      count(lit(1)).as("total_types")))
    top.crossJoin(spine)
      .groupBy("k")
      .agg(
        sum(when(col("rk") <= col("k"), col("n")).otherwise(0L))
          .as("in_vocab_occ"))
      .crossJoin(tot)
      .select(col("k"), col("total_occ"), col("total_types"),
        (col("total_occ") - col("in_vocab_occ")).as("oov_occ"),
        (col("total_types") - least(col("k"), col("total_types")))
          .as("oov_types"),
        expr("(total_occ - in_vocab_occ) * 1000000 div total_occ")
          .as("oov_rate_micro"))
      .orderBy("k")
  }

  // ---------------------------------------------------------------
  // cdc_order_inversions
  // ---------------------------------------------------------------

  def orderInversions(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select((col("user_id") % 32).as("partition"),
        col("event_id"),
        expr("cast(ts div 1000 as bigint)").as("tmicro"))
    // sequence-order delivery per partition (event_id = arrival seq);
    // an inversion = event-time going backwards between neighbours
    val w = Window.partitionBy("partition").orderBy("event_id")
    ev.withColumn("prev_t", lag("tmicro", 1).over(w))
      .withColumn("inv",
        when(col("prev_t").isNotNull && col("tmicro") < col("prev_t"),
          1L).otherwise(0L))
      .withColumn("back_us",
        when(col("inv") === 1L, col("prev_t") - col("tmicro"))
          .otherwise(0L))
      .groupBy("partition")
      .agg(count(lit(1)).as("n_msgs"),
        sum("inv").as("n_inversions"),
        max("back_us").as("max_backstep_micros"),
        sum("back_us").as("sum_backstep_micros"))
      .withColumn("inv_rate_micro",
        expr("n_inversions * 1000000 div greatest(n_msgs - 1, 1L)"))
      .orderBy("partition")
  }

  // ---------------------------------------------------------------
  // graph_conductance
  // ---------------------------------------------------------------

  def conductance(spark: SparkSession, dir: String): DataFrame = {
    // LPA communities over the customer–supplier graph: unlike CC
    // labels (components are CLOSED under the edge relation — cut
    // would be identically zero), LPA partitions have real cuts, so
    // the audit measures something
    val both = Ext28Queries.custSuppEdges(spark, dir)
    val labels = Ext28Queries.lpaLabelTable(spark, dir)
      .select(col("node").as("id"), col("label").as("cluster"))
    val edges = both.filter(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"))
    val lab = labels
    val tagged = edges
      .join(lab.select(col("id").as("id_a"),
        col("cluster").as("ca")), "id_a")
      .join(lab.select(col("id").as("id_b"),
        col("cluster").as("cb")), "id_b")
      .cache()
    // degree-volume per cluster: every endpoint contributes 1
    val vol = tagged.select(col("ca").as("cluster"))
      .unionAll(tagged.select(col("cb").as("cluster")))
      .groupBy("cluster").agg(count(lit(1)).as("volume"))
    val totVol = broadcast(vol.agg(sum("volume").as("total_volume")))
    val internal = tagged.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("cluster"))
      .agg(count(lit(1)).as("internal_edges"))
    val cut = tagged.filter(col("ca") =!= col("cb"))
      .select(explode(array(col("ca"), col("cb"))).as("cluster"))
      .groupBy("cluster").agg(count(lit(1)).as("cut_edges"))
    labels.groupBy("cluster").agg(count(lit(1)).as("n_members"))
      .join(vol, Seq("cluster"), "left")
      .join(internal, Seq("cluster"), "left")
      .join(cut, Seq("cluster"), "left")
      .crossJoin(totVol)
      .select(col("cluster"), col("n_members"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        coalesce(col("volume"), lit(0L)).as("volume"),
        // phi = cut / min(vol, totalVol - vol); null for a
        // whole-graph or zero-volume cluster
        when(coalesce(col("volume"), lit(0L)) === 0L ||
            col("total_volume") === col("volume"),
          lit(null).cast("long"))
          .otherwise(expr("coalesce(cut_edges, 0L) * 1000000 div " +
            "least(volume, total_volume - volume)"))
          .as("phi_micro"))
      .orderBy("cluster")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tok_oov_curve" -> oovCurve _,
    "cdc_order_inversions" -> orderInversions _,
    "graph_conductance" -> conductance _,
  )

  /** The graph_label_prop LPA chain (3 synchronous iterations over
    * the customer–supplier graph) — shared by the conductance oracle.
    */
  private val lpaChain =
    """WITH one_way AS (
      |  SELECT DISTINCT o.o_custkey AS cust,
      |    l.l_suppkey + 1000000 AS supp
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |), edges AS (
      |  SELECT cust AS src, supp AS dst FROM one_way
      |  UNION ALL
      |  SELECT supp AS src, cust AS dst FROM one_way
      |), l0 AS (
      |  SELECT DISTINCT src AS node, src AS label FROM edges
      |), i1 AS (
      |  SELECT src AS node, nlabel AS label FROM (
      |    SELECT e.src, l.label AS nlabel, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.src
      |        ORDER BY count(*) DESC, l.label) AS rk
      |    FROM edges e JOIN l0 l ON e.dst = l.node
      |    GROUP BY e.src, l.label) x WHERE rk = 1
      |), i2 AS (
      |  SELECT src AS node, nlabel AS label FROM (
      |    SELECT e.src, l.label AS nlabel, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.src
      |        ORDER BY count(*) DESC, l.label) AS rk
      |    FROM edges e JOIN i1 l ON e.dst = l.node
      |    GROUP BY e.src, l.label) x WHERE rk = 1
      |), i3 AS (
      |  SELECT src AS node, nlabel AS label FROM (
      |    SELECT e.src, l.label AS nlabel, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY e.src
      |        ORDER BY count(*) DESC, l.label) AS rk
      |    FROM edges e JOIN i2 l ON e.dst = l.node
      |    GROUP BY e.src, l.label) x WHERE rk = 1
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "tok_oov_curve" ->
      """WITH toks AS (
        |  SELECT lower(t.tok) AS tok FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |    FROM documents) t
        |), freq AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS n
        |  FROM toks GROUP BY tok
        |), ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY n DESC, tok) AS rk
        |  FROM freq
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total_occ,
        |    CAST(count(*) AS BIGINT) AS total_types
        |  FROM freq
        |), g AS (SELECT unnest([50, 100, 200]) AS k)
        |SELECT CAST(g.k AS BIGINT) AS k, t.total_occ, t.total_types,
        |  CAST(sum(CASE WHEN r.rk > g.k THEN r.n ELSE 0 END)
        |    AS BIGINT) AS oov_occ,
        |  CAST(sum(CASE WHEN r.rk > g.k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS oov_types,
        |  CAST(sum(CASE WHEN r.rk > g.k THEN r.n ELSE 0 END)
        |    * 1000000 // t.total_occ AS BIGINT) AS oov_rate_micro
        |FROM ranked r, g, tot t
        |GROUP BY g.k, t.total_occ, t.total_types
        |ORDER BY k""".stripMargin,
    "cdc_order_inversions" ->
      """WITH ev AS (
        |  SELECT user_id % 32 AS partition, event_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS tmicro
        |  FROM events
        |), lagged AS (
        |  SELECT partition, event_id, tmicro,
        |    lag(tmicro) OVER (PARTITION BY partition
        |      ORDER BY event_id) AS prev_t
        |  FROM ev
        |), f AS (
        |  SELECT partition,
        |    CASE WHEN prev_t IS NOT NULL AND tmicro < prev_t
        |      THEN 1 ELSE 0 END AS inv,
        |    CASE WHEN prev_t IS NOT NULL AND tmicro < prev_t
        |      THEN prev_t - tmicro ELSE 0 END AS back_us
        |  FROM lagged)
        |SELECT CAST(partition AS BIGINT) AS partition,
        |  CAST(count(*) AS BIGINT) AS n_msgs,
        |  CAST(sum(inv) AS BIGINT) AS n_inversions,
        |  CAST(max(back_us) AS BIGINT) AS max_backstep_micros,
        |  CAST(sum(back_us) AS BIGINT) AS sum_backstep_micros,
        |  CAST(sum(inv) * 1000000 // greatest(count(*) - 1, 1)
        |    AS BIGINT) AS inv_rate_micro
        |FROM f GROUP BY partition ORDER BY partition""".stripMargin,
    "graph_conductance" -> (lpaChain +
      """, pairs AS (
        |  SELECT src AS id_a, dst AS id_b FROM edges WHERE src < dst
        |), tagged AS (
        |  SELECT p.id_a, p.id_b, la.label AS ca, lb.label AS cb
        |  FROM pairs p
        |  JOIN i3 la ON la.node = p.id_a
        |  JOIN i3 lb ON lb.node = p.id_b
        |), labels AS (
        |  SELECT node AS id, label AS cluster FROM i3
        |), vol AS (
        |  SELECT cluster, CAST(count(*) AS BIGINT) AS volume FROM (
        |    SELECT ca AS cluster FROM tagged
        |    UNION ALL SELECT cb FROM tagged) u
        |  GROUP BY cluster
        |), tv AS (SELECT CAST(sum(volume) AS BIGINT) AS total_volume
        |  FROM vol
        |), internal AS (
        |  SELECT ca AS cluster, CAST(count(*) AS BIGINT)
        |    AS internal_edges
        |  FROM tagged WHERE ca = cb GROUP BY ca
        |), cut AS (
        |  SELECT cluster, CAST(count(*) AS BIGINT) AS cut_edges FROM (
        |    SELECT ca AS cluster FROM tagged WHERE ca <> cb
        |    UNION ALL SELECT cb FROM tagged WHERE ca <> cb) u
        |  GROUP BY cluster
        |), mem AS (
        |  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
        |  FROM labels GROUP BY cluster)
        |SELECT m.cluster, m.n_members,
        |  CAST(COALESCE(i.internal_edges, 0) AS BIGINT)
        |    AS internal_edges,
        |  CAST(COALESCE(c.cut_edges, 0) AS BIGINT) AS cut_edges,
        |  CAST(COALESCE(v.volume, 0) AS BIGINT) AS volume,
        |  CASE WHEN COALESCE(v.volume, 0) = 0
        |      OR tv.total_volume = v.volume THEN NULL
        |    ELSE CAST(COALESCE(c.cut_edges, 0) * 1000000
        |      // least(v.volume, tv.total_volume - v.volume)
        |      AS BIGINT) END AS phi_micro
        |FROM mem m
        |LEFT JOIN vol v ON v.cluster = m.cluster
        |LEFT JOIN internal i ON i.cluster = m.cluster
        |LEFT JOIN cut c ON c.cluster = m.cluster
        |CROSS JOIN tv
        |ORDER BY m.cluster""".stripMargin),
  )
}
