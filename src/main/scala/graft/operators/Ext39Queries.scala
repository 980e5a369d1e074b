package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 2: index health, classifier calibration, and
  * time-sliced experimentation.
  *
  *  - `sim_ivf_cell_skew`: the IVF inverted-list skew report — per
  *    cell: list size, traffic share, deviation from the uniform
  *    ideal. The number an ANN operator reads before trusting probe
  *    latency: one hot cell means p99 probes scan that list, and the
  *    fix (re-fit, split, or spill the hot cell) is a re-index
  *    decision. Same fit params as sim_ann_ivf, so it audits the
  *    exact quantizer the search queries use.
  *  - `eval_reliability_bins`: probability-reliability bins for the langid heuristic's
  *    'en' confidence against the corpus' TRUE `lang` labels — the
  *    calibration audit (is an 0.9-confidence prediction right 90%
  *    of the time?) every model-scored curation gate needs before
  *    its scores can set thresholds. Fixed-width decile bins on the
  *    exact integer confidence lattice.
  *  - `ev_switchback`: time-sliced (switchback) experiment readout —
  *    arms alternate by UTC hour (the design used when units
  *    interfere, e.g. marketplace/pricing changes), with a 10-minute
  *    post-switch burn-in excluded to keep carryover out of the
  *    estimate. Per-arm exact moments + the arm-1-minus-arm-0 lift.
  *
  * 100 TB shapes: the skew report is one |cells|-sized aggregate
  * over the narrow assignment projection; calibration is a 10-row
  * rollup of a per-doc token-hit scan; the switchback readout
  * collapses to (hour, arm) cells map-side before any shuffle.
  */
object Ext39Queries {

  // ---------------------------------------------------------------
  // sim_ivf_cell_skew
  // ---------------------------------------------------------------

  def ivfCellSkew(spark: SparkSession, dir: String): DataFrame = {
    val assigned = Similarity.assignClusters(
      t(spark, dir, "embeddings"), "vec_id", "embedding",
      nCells = 16, kmeansIters = 2, fitSampleMod = 2)
    val sizes = assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"))
    val total = broadcast(sizes.agg(
      sum("n_vecs").as("n_total"),
      count(lit(1)).as("n_cells")))
    sizes.crossJoin(total)
      .withColumn("share_micro",
        expr("n_vecs * 1000000 div n_total"))
      // deviation from the uniform ideal share (1e6 / live cells)
      .withColumn("dev_micro",
        expr("abs(n_vecs * 1000000 div n_total" +
          " - 1000000 div n_cells)"))
      .select("cell", "n_vecs", "share_micro", "dev_micro")
      .orderBy("cell")
  }

  // ---------------------------------------------------------------
  // eval_reliability_bins
  // ---------------------------------------------------------------

  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.langId(
      t(spark, dir, "documents"), "text")
    scored
      // add-one-smoothed 'en' confidence on the exact integer
      // lattice: (en+1)/(en+es+2) — the smoothing keeps weak-evidence
      // docs off the 0/1 extremes so the reliability curve actually
      // has mass in the interior bins
      .withColumn("conf_micro",
        expr("(en_hits + 1) * 1000000 div (en_hits + es_hits + 2)"))
      .withColumn("bin", least(expr("conf_micro div 100000"), lit(9L)))
      .withColumn("is_en",
        when(col("lang") === "en", 1L).otherwise(0L))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(conf_micro) div count(1)").as("mean_conf_micro"),
        expr("sum(is_en) * 1000000 div count(1)").as("en_rate_micro"))
      .withColumn("gap_micro",
        abs(col("mean_conf_micro") - col("en_rate_micro")))
      .orderBy("bin")
  }

  // ---------------------------------------------------------------
  // ev_switchback
  // ---------------------------------------------------------------

  def switchback(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(expr("ts div 1000000000").as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .withColumn("arm", expr("tsec div 3600 % 2"))
      .withColumn("burnin", expr("tsec % 3600 < 600"))
    val arms = ev.groupBy("arm")
      .agg(sum(when(col("burnin"), 1L).otherwise(0L))
          .as("n_burnin_excluded"),
        sum(when(!col("burnin"), 1L).otherwise(0L)).as("n_events"),
        sum(when(!col("burnin"), col("vm")).otherwise(0L))
          .as("s_milli"))
      .withColumn("mean_milli_micro",
        expr("s_milli * 1000000 div n_events"))
    val lift = broadcast(arms.agg(
      expr("max(case when arm = 1 then mean_milli_micro end)" +
        " - max(case when arm = 0 then mean_milli_micro end)")
        .as("lift_micro")))
    arms.crossJoin(lift)
      .select("arm", "n_events", "n_burnin_excluded", "s_milli",
        "mean_milli_micro", "lift_micro")
      .orderBy("arm")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ivf_cell_skew" -> ivfCellSkew _,
    "eval_reliability_bins" -> calibration _,
    "ev_switchback" -> switchback _,
  )

  private val enList = TextAnalysis.enStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")
  private val esList = TextAnalysis.esStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  val oracle: Map[String, String] = Map(
    "sim_ivf_cell_skew" ->
      (ExtQueries.ivfFitAssignSql(16, 2, 2) + """, sizes AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
  FROM assign GROUP BY cell
), tot AS (
  SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
    CAST(COUNT(*) AS BIGINT) AS n_cells FROM sizes)
SELECT s.cell, s.n_vecs,
  CAST(s.n_vecs * 1000000 // t.n_total AS BIGINT) AS share_micro,
  CAST(abs(s.n_vecs * 1000000 // t.n_total
    - 1000000 // t.n_cells) AS BIGINT) AS dev_micro
FROM sizes s, tot t
ORDER BY s.cell"""),
    "eval_reliability_bins" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang,
         |    string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, lang,
         |    CAST(len(list_filter(tk,
         |      x -> list_contains($enList, lower(x)))) AS BIGINT)
         |      AS en_hits,
         |    CAST(len(list_filter(tk,
         |      x -> list_contains($esList, lower(x)))) AS BIGINT)
         |      AS es_hits
         |  FROM base
         |), conf AS (
         |  SELECT doc_id,
         |    (en_hits + 1) * 1000000 // (en_hits + es_hits + 2)
         |      AS conf_micro,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
         |  FROM m
         |), binned AS (
         |  SELECT least(conf_micro // 100000, 9) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(conf_micro) // COUNT(*) AS BIGINT)
         |      AS mean_conf_micro,
         |    CAST(SUM(is_en) * 1000000 // COUNT(*) AS BIGINT)
         |      AS en_rate_micro
         |  FROM conf GROUP BY 1)
         |SELECT CAST(bin AS BIGINT) AS bin, n_docs, mean_conf_micro,
         |  en_rate_micro,
         |  CAST(abs(mean_conf_micro - en_rate_micro) AS BIGINT)
         |    AS gap_micro
         |FROM binned ORDER BY bin""".stripMargin,
    "ev_switchback" ->
      """WITH ev AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), arms AS (
        |  SELECT tsec // 3600 % 2 AS arm,
        |    CAST(SUM(CASE WHEN tsec % 3600 < 600 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_burnin_excluded,
        |    CAST(SUM(CASE WHEN tsec % 3600 >= 600 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_events,
        |    CAST(SUM(CASE WHEN tsec % 3600 >= 600 THEN vm ELSE 0 END)
        |      AS BIGINT) AS s_milli
        |  FROM ev GROUP BY 1
        |), m AS (
        |  SELECT *, CAST(s_milli * 1000000 // n_events AS BIGINT)
        |    AS mean_milli_micro
        |  FROM arms
        |), lift AS (
        |  SELECT CAST(
        |    max(CASE WHEN arm = 1 THEN mean_milli_micro END)
        |    - max(CASE WHEN arm = 0 THEN mean_milli_micro END)
        |    AS BIGINT) AS lift_micro
        |  FROM m)
        |SELECT CAST(m.arm AS BIGINT) AS arm, m.n_events,
        |  m.n_burnin_excluded, m.s_milli, m.mean_milli_micro,
        |  l.lift_micro
        |FROM m, lift l ORDER BY m.arm""".stripMargin,
  )
}
