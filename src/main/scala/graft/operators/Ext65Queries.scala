package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 28: schema-compatibility classification and
  * empirical-Bayes shrinkage.
  *
  *  - `cdc_schema_compat`: the schema-registry compatibility rules
  *    applied to the changelog itself — three payload generations
  *    ride the stream (v1 base; v2 adds `score_milli`; v3 drops
  *    `event_type` and adds `tags`), and each adjacent transition
  *    is classified from the OBSERVED key sets: additions only →
  *    BACKWARD (new readers read old rows), removals only →
  *    FORWARD, both → BREAKING, neither → FULL. This is the gate a
  *    registry enforces before letting a producer deploy; here it
  *    runs post-hoc over the stream, which is what you do when the
  *    producer didn't ask first.
  *  - `ev_eb_shrinkage`: empirical-Bayes mean shrinkage — per-user
  *    means pulled toward the global mean with prior strength
  *    k = 20 (`(n·x̄ + k·μ) div (n + k)`, all integer micro): the
  *    small-sample correction that stops a 3-event user from
  *    topping the leaderboard. Reports raw vs shrunk per user, with
  *    the shrink always BETWEEN raw and prior (asserted in spec).
  *
  * 100 TB shapes: compat is a json_object_keys scan collapsed to
  * |versions|·|keys| cells then a ≤2-row report; shrinkage is one
  * per-user aggregate plus a 1-row global broadcast.
  */
object Ext65Queries {

  // ---------------------------------------------------------------
  // cdc_schema_compat
  // ---------------------------------------------------------------

  /** Three payload generations keyed off event_id — concatenation
    * only, so the oracle builds identical bytes.
    */
  private def payload = {
    val vm = expr("cast(round(value * 1000) as bigint)").cast("string")
    val gen = col("event_id") % 3
    when(gen === 0, concat(lit("{\"user_id\":"),
      col("user_id").cast("string"),
      lit(",\"event_type\":\""), col("event_type"),
      lit("\",\"value_milli\":"), vm, lit("}")))
      .when(gen === 1, concat(lit("{\"user_id\":"),
        col("user_id").cast("string"),
        lit(",\"event_type\":\""), col("event_type"),
        lit("\",\"value_milli\":"), vm,
        lit(",\"score_milli\":"), (col("event_id") % 997).cast("string"),
        lit("}")))
      .otherwise(concat(lit("{\"user_id\":"),
        col("user_id").cast("string"),
        lit(",\"value_milli\":"), vm,
        lit(",\"score_milli\":"), (col("event_id") % 997).cast("string"),
        lit(",\"tags\":\"t"), (col("event_id") % 5).cast("string"),
        lit("\"}")))
  }

  def schemaCompat(spark: SparkSession, dir: String): DataFrame = {
    val keysPerVersion = t(spark, dir, "events")
      .select((col("event_id") % 3).as("version"), payload.as("p"))
      .select(col("version"), explode(json_object_keys(col("p")))
        .as("k"))
      .distinct()
    // added/removed per transition (0->1, 1->2) from the key sets
    val cur = keysPerVersion
    val nxt = keysPerVersion.select((col("version") - 1).as("version"),
      col("k").as("k2"))
    val added = nxt.join(cur.select(col("version"),
        col("k").as("k2"), lit(1).as("inc")), Seq("version", "k2"),
        "left")
      .filter(col("inc").isNull && col("version").isin(0, 1))
      .groupBy("version").agg(count(lit(1)).as("n_added"))
    val removed = cur.filter(col("version").isin(0, 1))
      .join(nxt.select(col("version"), col("k2").as("k"),
        lit(1).as("inn")), Seq("version", "k"), "left")
      .filter(col("inn").isNull)
      .groupBy("version").agg(count(lit(1)).as("n_removed"))
    cur.select(col("version")).filter(col("version").isin(0, 1))
      .distinct()
      .join(added, Seq("version"), "left")
      .join(removed, Seq("version"), "left")
      .na.fill(0L, Seq("n_added", "n_removed"))
      .withColumn("compat",
        when(col("n_added") > 0 && col("n_removed") > 0,
          lit("breaking"))
          .when(col("n_added") > 0, lit("backward"))
          .when(col("n_removed") > 0, lit("forward"))
          .otherwise(lit("full")))
      .select(col("version").as("from_version"),
        (col("version") + 1).as("to_version"),
        col("n_added"), col("n_removed"), col("compat"))
      .orderBy("from_version")
  }

  // ---------------------------------------------------------------
  // ev_eb_shrinkage
  // ---------------------------------------------------------------

  def ebShrinkage(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val prior = broadcast(ev.agg(
      expr("sum(vm) * 1000 div count(*)").as("mu_micro")))
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("vm").as("s"))
      .crossJoin(prior)
      .withColumn("raw_micro", expr("s * 1000 div n"))
      .withColumn("shrunk_micro",
        expr("(s * 1000 + 20 * mu_micro) div (n + 20)"))
      .select("user_id", "n", "raw_micro", "shrunk_micro", "mu_micro")
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_schema_compat" -> schemaCompat _,
    "ev_eb_shrinkage" -> ebShrinkage _,
  )

  val oracle: Map[String, String] = Map(
    "cdc_schema_compat" ->
      """WITH env AS (
        |  SELECT event_id % 3 AS version,
        |    CASE event_id % 3
        |      WHEN 0 THEN '{"user_id":' || user_id
        |        || ',"event_type":"' || event_type
        |        || '","value_milli":'
        |        || CAST(round(value * 1000) AS BIGINT) || '}'
        |      WHEN 1 THEN '{"user_id":' || user_id
        |        || ',"event_type":"' || event_type
        |        || '","value_milli":'
        |        || CAST(round(value * 1000) AS BIGINT)
        |        || ',"score_milli":' || (event_id % 997) || '}'
        |      ELSE '{"user_id":' || user_id
        |        || ',"value_milli":'
        |        || CAST(round(value * 1000) AS BIGINT)
        |        || ',"score_milli":' || (event_id % 997)
        |        || ',"tags":"t' || (event_id % 5) || '"}'
        |    END AS p
        |  FROM events
        |), kv AS (
        |  SELECT DISTINCT version, unnest(json_keys(p)) AS k FROM env
        |), added AS (
        |  SELECT n.version - 1 AS version,
        |    CAST(count(*) AS BIGINT) AS n_added
        |  FROM kv n
        |  WHERE n.version IN (1, 2) AND NOT EXISTS (
        |    SELECT 1 FROM kv c WHERE c.version = n.version - 1
        |      AND c.k = n.k)
        |  GROUP BY n.version
        |), removed AS (
        |  SELECT c.version, CAST(count(*) AS BIGINT) AS n_removed
        |  FROM kv c
        |  WHERE c.version IN (0, 1) AND NOT EXISTS (
        |    SELECT 1 FROM kv n WHERE n.version = c.version + 1
        |      AND n.k = c.k)
        |  GROUP BY c.version
        |), spine AS (SELECT 0 AS version UNION ALL SELECT 1)
        |SELECT CAST(s.version AS BIGINT) AS from_version,
        |  CAST(s.version + 1 AS BIGINT) AS to_version,
        |  CAST(COALESCE(a.n_added, 0) AS BIGINT) AS n_added,
        |  CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
        |  CASE WHEN COALESCE(a.n_added, 0) > 0
        |      AND COALESCE(r.n_removed, 0) > 0 THEN 'breaking'
        |    WHEN COALESCE(a.n_added, 0) > 0 THEN 'backward'
        |    WHEN COALESCE(r.n_removed, 0) > 0 THEN 'forward'
        |    ELSE 'full' END AS compat
        |FROM spine s
        |LEFT JOIN added a ON a.version = s.version
        |LEFT JOIN removed r ON r.version = s.version
        |ORDER BY from_version""".stripMargin,
    "ev_eb_shrinkage" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), prior AS (
        |  SELECT CAST(SUM(vm) * 1000 // count(*) AS BIGINT) AS mu_micro
        |  FROM ev
        |)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(SUM(vm) * 1000 // count(*) AS BIGINT) AS raw_micro,
        |  CAST((SUM(vm) * 1000 + 20 * p.mu_micro) // (count(*) + 20)
        |    AS BIGINT) AS shrunk_micro,
        |  p.mu_micro
        |FROM ev CROSS JOIN prior p
        |GROUP BY user_id, p.mu_micro
        |ORDER BY user_id""".stripMargin,
  )
}
