package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 19: autoregressive diagnostics on the integer
  * lattice.
  *
  *  - `ts_ar1_fit`: the AR(1) fit per event type over the demeaned
  *    daily-mean series — φ = Σc_t·c_{t−1} / Σc_{t−1}² as an exact
  *    integer ratio in micro units. Demeaning uses the floor mean
  *    (`(s − pmod(s, n)) div n`) and the possibly-negative ratio
  *    uses the pmod-floor division on BOTH engines, per the repo's
  *    division-lattice discipline. The raw moments (sxy, sxx) ride
  *    along so the ratio is auditable, and lag-1 pairing is an
  *    explicit (type, day) equi-join — no window sort needed.
  *
  * 100 TB shape: one groupBy(type, day) pre-aggregate (map-side
  * combined) reduces the corpus to |types|·|days| cells; everything
  * after is constant-size.
  */
object Ext56Queries {

  def ar1Fit(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day")
      .agg(expr("(sum(vm) - pmod(sum(vm), count(*))) div count(*)")
        .as("m"))
    val mbar = daily.groupBy("event_type")
      .agg(expr("(sum(m) - pmod(sum(m), count(*))) div count(*)")
        .as("mbar"))
    val c = daily.join(mbar, "event_type")
      .select(col("event_type"), col("day"),
        (col("m") - col("mbar")).as("c"))
    val lag1 = c.select(col("event_type"), (col("day") + 1).as("day"),
      col("c").as("c_prev"))
    val moments = c.join(lag1, Seq("event_type", "day"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c") * col("c_prev")).as("sxy"),
        sum(col("c_prev") * col("c_prev")).as("sxx"))
    moments
      .withColumn("phi_micro", expr(
        "(sxy * 1000000 - pmod(pmod(sxy * 1000000, sxx) + sxx, sxx))" +
          " div sxx"))
      .join(mbar, "event_type")
      .select("event_type", "n_pairs", "mbar", "sxy", "sxx",
        "phi_micro")
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_ar1_fit" -> ar1Fit _,
  )

  val oracle: Map[String, String] = Map(
    "ts_ar1_fit" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    (SUM(CAST(round(value * 1000) AS BIGINT))
        |      - ((SUM(CAST(round(value * 1000) AS BIGINT)) % count(*))
        |         + count(*)) % count(*)) // count(*) AS m
        |  FROM events GROUP BY 1, 2
        |), mbar AS (
        |  SELECT event_type,
        |    (SUM(m) - ((SUM(m) % count(*)) + count(*)) % count(*))
        |      // count(*) AS mbar
        |  FROM daily GROUP BY event_type
        |), c AS (
        |  SELECT d.event_type, d.day, d.m - b.mbar AS c
        |  FROM daily d JOIN mbar b ON b.event_type = d.event_type
        |), moments AS (
        |  SELECT x.event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(x.c * p.c) AS BIGINT) AS sxy,
        |    CAST(SUM(p.c * p.c) AS BIGINT) AS sxx
        |  FROM c x JOIN c p ON p.event_type = x.event_type
        |    AND p.day = x.day - 1
        |  GROUP BY x.event_type
        |)
        |SELECT mo.event_type, mo.n_pairs,
        |  CAST(b.mbar AS BIGINT) AS mbar, mo.sxy, mo.sxx,
        |  CAST((mo.sxy * 1000000
        |    - ((mo.sxy * 1000000 % mo.sxx) + mo.sxx) % mo.sxx)
        |    // mo.sxx AS BIGINT) AS phi_micro
        |FROM moments mo JOIN mbar b ON b.event_type = mo.event_type
        |ORDER BY mo.event_type""".stripMargin,
  )
}
