package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 11: distributional experiment readout and its
  * validity gate.
  *
  *  - `eval_ab_qte`: quantile treatment effects — the A/B readout
  *    beyond the mean (`ev_ab_ttest` tells you IF the groups differ;
  *    this tells you WHERE in the distribution). Rank-selected
  *    p25/p50/p75/p90 per deterministic arm (`user_id % 2`), exact
  *    integers, plus the per-quantile difference.
  *  - `dq_srm_check`: sample-ratio mismatch — the first gate every
  *    experiment readout must pass (a biased assignment invalidates
  *    everything downstream). One-df chi-square of RANDOMIZATION-
  *    UNIT (user) counts against 50/50 on the micro lattice; flag at
  *    the 95% critical value (3.841459·1e6, literal — no chi2 CDF
  *    needed for a fixed threshold). Counting events instead of
  *    users over-rejects — see the method note on [[srmCheck]].
  *
  * 100 TB shapes: QTE is one (grp, vm) sort per arm (window
  * partitioned by arm) + one conditional aggregate; SRM is a single
  * conditional aggregate — both map-side combined, nothing beyond
  * the two-arm lattice ever shuffles wide.
  */
object Ext25Queries {

  // ---------------------------------------------------------------
  // eval_ab_qte
  // ---------------------------------------------------------------

  def abQte(spark: SparkSession, dir: String): DataFrame = {
    val wRank = Window.partitionBy("grp")
      .orderBy(col("vm"), col("event_id"))
    val wGrp = Window.partitionBy("grp")
    val ranked = t(spark, dir, "events")
      .select((col("user_id") % 2).as("grp"), col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wGrp))
    def pick(g: Int, p: Int) =
      max(when(col("grp") === g &&
        col("rn") === expr(s"(n - 1) * $p div 100 + 1"), col("vm")))
    ranked.agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_b"),
        pick(0, 25).as("p25_a"), pick(1, 25).as("p25_b"),
        pick(0, 50).as("p50_a"), pick(1, 50).as("p50_b"),
        pick(0, 75).as("p75_a"), pick(1, 75).as("p75_b"),
        pick(0, 90).as("p90_a"), pick(1, 90).as("p90_b"))
      .select(col("n_a"), col("n_b"),
        col("p25_a"), col("p25_b"),
        (col("p25_b") - col("p25_a")).as("qte25_milli"),
        col("p50_a"), col("p50_b"),
        (col("p50_b") - col("p50_a")).as("qte50_milli"),
        col("p75_a"), col("p75_b"),
        (col("p75_b") - col("p75_a")).as("qte75_milli"),
        col("p90_a"), col("p90_b"),
        (col("p90_b") - col("p90_a")).as("qte90_milli"))
  }

  // ---------------------------------------------------------------
  // dq_srm_check
  // ---------------------------------------------------------------

  /** 95% critical value for chi-square with 1 df, micro lattice. */
  private val SrmCritMicro = 3841459L

  /** Counts RANDOMIZATION UNITS (users), not events: events cluster
    * by user, so an event-level count against a binomial null
    * over-rejects — measured on this very fixture (event-level χ² =
    * 15.4 at sf0.001 on a perfectly fair user split). The unit you
    * randomize is the unit you must count.
    */
  def srmCheck(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "events")
      .select(col("user_id")).distinct()
      .agg(sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L))
          .as("n_a"),
        sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
          .as("n_b"))
      .withColumn("chi2_micro",
        expr("(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b)"))
      .withColumn("srm_detected", col("chi2_micro") > SrmCritMicro)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_ab_qte" -> abQte _,
    "dq_srm_check" -> srmCheck _,
  )

  def oracle: Map[String, String] = Map(
    "eval_ab_qte" ->
      """WITH ev AS (
        |  SELECT user_id % 2 AS grp, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), rk AS (
        |  SELECT grp, vm,
        |    ROW_NUMBER() OVER (PARTITION BY grp
        |      ORDER BY vm, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY grp) AS n
        |  FROM ev
        |), w AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    MAX(CASE WHEN grp = 0 AND rn = (n - 1) * 25 // 100 + 1
        |      THEN vm END) AS p25_a,
        |    MAX(CASE WHEN grp = 1 AND rn = (n - 1) * 25 // 100 + 1
        |      THEN vm END) AS p25_b,
        |    MAX(CASE WHEN grp = 0 AND rn = (n - 1) * 50 // 100 + 1
        |      THEN vm END) AS p50_a,
        |    MAX(CASE WHEN grp = 1 AND rn = (n - 1) * 50 // 100 + 1
        |      THEN vm END) AS p50_b,
        |    MAX(CASE WHEN grp = 0 AND rn = (n - 1) * 75 // 100 + 1
        |      THEN vm END) AS p75_a,
        |    MAX(CASE WHEN grp = 1 AND rn = (n - 1) * 75 // 100 + 1
        |      THEN vm END) AS p75_b,
        |    MAX(CASE WHEN grp = 0 AND rn = (n - 1) * 90 // 100 + 1
        |      THEN vm END) AS p90_a,
        |    MAX(CASE WHEN grp = 1 AND rn = (n - 1) * 90 // 100 + 1
        |      THEN vm END) AS p90_b
        |  FROM rk)
        |SELECT n_a, n_b,
        |  p25_a, p25_b, p25_b - p25_a AS qte25_milli,
        |  p50_a, p50_b, p50_b - p50_a AS qte50_milli,
        |  p75_a, p75_b, p75_b - p75_a AS qte75_milli,
        |  p90_a, p90_b, p90_b - p90_a AS qte90_milli
        |FROM w""".stripMargin,
    "dq_srm_check" ->
      s"""WITH u AS (
        |  SELECT DISTINCT user_id FROM events
        |), c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b
        |  FROM u)
        |SELECT n_a, n_b,
        |  ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
        |    AS chi2_micro,
        |  ((n_a - n_b) * (n_a - n_b) * 1000000) // (n_a + n_b)
        |    > $SrmCritMicro AS srm_detected
        |FROM c""".stripMargin,
  )
}
