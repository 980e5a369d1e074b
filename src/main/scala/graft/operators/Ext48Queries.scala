package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 11: window-filter (QUALIFY) surface, DISTINCT ON
  * as a single hash aggregate, and blocked fuzzy entity resolution.
  *
  *  - `q80_qualify`: top-3 orders per customer — the QUALIFY sugar
  *    (filter over a window function) that modern dialects grew.
  *    Spark expresses it as window + filter, and the point of the
  *    query is what Catalyst then does with it: the `rk <= 3`
  *    predicate is pushed INTO the window as a `WindowGroupLimit`,
  *    so each map task keeps only 3 rows per key before the shuffle
  *    — the spec asserts the node is in the plan.
  *  - `q81_distinct_on`: latest event per user (DuckDB `DISTINCT ON`
  *    / `argmax` surface). Deliberately NOT a window: one
  *    `max(struct(ts, event_id, ...))` hash aggregate with map-side
  *    combine — no per-key sort, no window shuffle, the idiom that
  *    wins at 100 TB where per-user row counts are skewed.
  *  - `dq_fuzzy_match`: entity resolution customers↔suppliers on
  *    the 9-digit name id with Levenshtein ≤ 1, blocked by the
  *    DELETION NEIGHBORHOOD (SymSpell-style): each record emits its
  *    9 delete-one-position keys, candidates meet on (position,
  *    key), then the exact distance verifies. Complete for ≤1 edit
  *    by construction, and never materializes |C|×|S|.
  *
  * 100 TB shapes: q80 shuffles ≤3 rows/key after the group-limit;
  * q81 is one agg with partial combine; the fuzzy match is a 9×
  * row-explode into an equi-join whose per-key candidate lists are
  * bounded by id-neighborhood density, with the quadratic verify
  * only inside candidate pairs.
  */
object Ext48Queries {

  // ---------------------------------------------------------------
  // q80_qualify
  // ---------------------------------------------------------------

  def qualifyTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("price_c"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_c").desc, col("o_orderkey"))
    o.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .orderBy("o_custkey", "rk")
      .select("o_custkey", "o_orderkey", "price_c", "rk")
  }

  // ---------------------------------------------------------------
  // q81_distinct_on
  // ---------------------------------------------------------------

  def distinctOn(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(
      col("user_id"),
      expr("ts div 1000").as("tu"),
      col("event_id"),
      col("event_type"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
    // (tu, event_id) is unique, so the struct max never reaches the
    // string field — engine-independent by construction
    ev.groupBy("user_id")
      .agg(max(struct(col("tu"), col("event_id"), col("event_type"),
        col("vm"))).as("m"))
      .select(col("user_id"),
        col("m.tu").as("last_tu"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"),
        col("m.vm").as("last_vm"))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------
  // dq_fuzzy_match
  // ---------------------------------------------------------------

  /** The 9 delete-one-position keys of a 9-char id, tagged with the
    * deleted position — two equal-length strings within one
    * substitution share the key at the substituted position.
    */
  private def delKeys(id: Column): Column = array(
    (0 until 9).map { i =>
      struct(lit(i).as("i"),
        concat(substring(id, 1, i), substring(id, i + 2, 8 - i))
          .as("k"))
    }: _*)

  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), substring(col("c_name"), 10, 9).as("cid"))
    val s = t(spark, dir, "supplier")
      .select(col("s_suppkey"), substring(col("s_name"), 10, 9).as("sid"))
    val cb = c.select(col("c_custkey"), col("cid"),
      explode(delKeys(col("cid"))).as("dk"))
      .select(col("c_custkey"), col("cid"),
        col("dk.i").as("i"), col("dk.k").as("k"))
    val sb = s.select(col("s_suppkey"), col("sid"),
      explode(delKeys(col("sid"))).as("dk"))
      .select(col("s_suppkey"), col("sid"),
        col("dk.i").as("i"), col("dk.k").as("k"))
    cb.join(sb, Seq("i", "k"))
      .select("c_custkey", "s_suppkey", "cid", "sid")
      .distinct() // lev-0 pairs share all 9 keys; lev-1 exactly one
      .filter(levenshtein(col("cid"), col("sid")) <= 1)
      .select(col("c_custkey"), col("s_suppkey"),
        levenshtein(col("cid"), col("sid")).cast("long").as("lev"))
      .orderBy("c_custkey", "s_suppkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_qualify" -> qualifyTopOrders _,
    "q81_distinct_on" -> distinctOn _,
    "dq_fuzzy_match" -> fuzzyMatch _,
  )

  val oracle: Map[String, String] = Map(
    "q80_qualify" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
        |  CAST(row_number() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY round(o_totalprice * 100) DESC, o_orderkey)
        |    AS BIGINT) AS rk
        |FROM orders
        |QUALIFY rk <= 3
        |ORDER BY o_custkey, rk""".stripMargin,
    "q81_distinct_on" ->
      """SELECT user_id, last_tu, last_event_id, last_type, last_vm
        |FROM (
        |  SELECT DISTINCT ON (user_id) user_id,
        |    epoch_us(ts) AS last_tu,
        |    event_id AS last_event_id,
        |    event_type AS last_type,
        |    CAST(round(value * 1000) AS BIGINT) AS last_vm
        |  FROM events
        |  ORDER BY user_id, epoch_us(ts) DESC, event_id DESC)
        |ORDER BY user_id""".stripMargin,
    "dq_fuzzy_match" ->
      """SELECT c.c_custkey, s.s_suppkey,
        |  CAST(levenshtein(substr(c.c_name, 10, 9),
        |    substr(s.s_name, 10, 9)) AS BIGINT) AS lev
        |FROM customer c JOIN supplier s
        |  ON levenshtein(substr(c.c_name, 10, 9),
        |       substr(s.s_name, 10, 9)) <= 1
        |ORDER BY c.c_custkey, s.s_suppkey""".stripMargin,
  )
}
