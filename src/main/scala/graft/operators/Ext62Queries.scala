package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 25: the deterministic Poisson bootstrap.
  *
  *  - `ev_bootstrap_ci`: percentile bootstrap CI for the mean
  *    purchase value, production style — each of B = 40 resamples
  *    weights every row by an independent Poisson(1) count (the
  *    "Poisson bootstrap", the only bootstrap that runs in one pass
  *    over distributed data, since multinomial resampling would need
  *    global coordination). The Poisson draw is DETERMINISTIC:
  *    md5(b, event_id) maps through the exact cumulative-Poisson
  *    thresholds pre-scaled to 2^52, so both engines draw the
  *    identical weights and the CI reproduces run-over-run — the
  *    property that makes a metrics pipeline auditable. Report:
  *    point estimate plus the rank-1/rank-40 resample means
  *    (≈ 2.5th/97.5th percentile at B = 40), all in integer micro.
  *
  * 100 TB shape: the resample explode is a bounded ×B narrow
  * generator feeding ONE map-side-combined (b) aggregate — no
  * shuffle wider than B rows out; at B = 40 the pass costs ~40× the
  * metric scan and zero coordination, which is why Poissonization
  * is the standard at this scale.
  */
object Ext62Queries {

  private val B = 40

  /** Cumulative Poisson(1) thresholds, floor(c_k · 2^52). */
  private val Cum: Seq[Long] = Seq(
    1656781714176974L, 3313563428353948L, 4141954285442435L,
    4418084571138597L, 4487117142562638L, 4500923656847446L,
    4503224742561580L)

  /** 52-bit uniform from md5("bs:<b>:<id>") — oracle-identical. */
  private def u52(b: Column, id: Column): Column =
    conv(substring(md5(concat(lit("bs:"), b.cast("string"), lit(":"),
      id.cast("string"))), 1, 13), 16, 10).cast("long")

  private def poisson(u: Column): Column =
    Cum.zipWithIndex.foldRight(lit(Cum.length.toLong)) {
      case ((thr, k), rest) => when(u < thr, k.toLong).otherwise(rest)
    }

  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val rows = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val bs = rows
      .select(col("event_id"), col("vm"),
        explode(sequence(lit(1), lit(B))).as("b"))
      .withColumn("wt", poisson(u52(col("b"), col("event_id"))))
      .groupBy("b")
      .agg(sum(col("wt") * col("vm")).as("s"),
        sum("wt").as("n"))
      .withColumn("mean_micro", expr("s * 1000 div n")) // milli->micro
    val ranked = bs.select("mean_micro").orderBy("mean_micro")
      .collect().map(_.getLong(0))
    val point = rows.agg(count(lit(1)).as("n"),
      expr("sum(vm) * 1000 div count(*)").as("mean_micro"))
      .collect()(0)
    import spark.implicits._
    Seq((point.getLong(0), point.getLong(1), ranked.head, ranked.last,
      ranked.length.toLong))
      .toDF("n_rows", "mean_micro", "ci_lo_micro", "ci_hi_micro",
        "n_resamples")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_bootstrap_ci" -> bootstrapCi _,
  )

  private val cumSql = Cum.zipWithIndex.map { case (thr, k) =>
    s"WHEN u < $thr THEN $k"
  }.mkString(" ")

  val oracle: Map[String, String] = Map(
    "ev_bootstrap_ci" ->
      s"""WITH rows_p AS (
        |  SELECT event_id, CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events WHERE event_type = 'purchase'
        |), drawn AS (
        |  SELECT r.event_id, r.vm, b.b,
        |    CAST(('0x' || substr(md5('bs:' || CAST(b.b AS VARCHAR)
        |      || ':' || CAST(r.event_id AS VARCHAR)), 1, 13))::UBIGINT
        |      AS BIGINT) AS u
        |  FROM rows_p r, (SELECT unnest(range(1, ${B + 1})) AS b) b
        |), weighted AS (
        |  SELECT b, vm, CASE $cumSql ELSE ${Cum.length} END AS wt
        |  FROM drawn
        |), means AS (
        |  SELECT b, CAST(SUM(wt * vm) * 1000 // SUM(wt) AS BIGINT)
        |    AS mean_micro
        |  FROM weighted GROUP BY b
        |), ranked AS (
        |  SELECT mean_micro,
        |    ROW_NUMBER() OVER (ORDER BY mean_micro) AS rk,
        |    COUNT(*) OVER () AS nb
        |  FROM means
        |), pt AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(vm) * 1000 // count(*) AS BIGINT) AS mean_micro
        |  FROM rows_p
        |)
        |SELECT pt.n_rows, pt.mean_micro,
        |  (SELECT mean_micro FROM ranked WHERE rk = 1) AS ci_lo_micro,
        |  (SELECT mean_micro FROM ranked WHERE rk = nb) AS ci_hi_micro,
        |  (SELECT CAST(MAX(nb) AS BIGINT) FROM ranked) AS n_resamples
        |FROM pt""".stripMargin,
  )
}
