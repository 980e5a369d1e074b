package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 6: dedup threshold economics, mean change-points,
  * and the composed curation pipeline.
  *
  *  - `sim_threshold_sweep`: the near-dup threshold sensitivity
  *    report — pair counts, affected-document counts and mean
  *    verified Jaccard at thresholds 0.1..0.5, computed in ONE pass
  *    over the stored verified-pair table ([[NearDupGraph]]). This
  *    is the report that decides where a dedup pipeline sets its
  *    knob; the sweep rides a bounded 5-row spine, never re-running
  *    LSH per threshold.
  *  - `ts_changepoint_mean`: single mean change-point per event-type
  *    day series by exact SSE-gain binary segmentation — prefix-sum
  *    windows give every split's left/right sums, the gain
  *    S_l²/n_l + S_r²/n_r − S²/n evaluates in doubles from exact
  *    integer sums (identical text both engines), argmax with
  *    deterministic earliest-day tie-break.
  *  - `pipeline_curate3`: the COMPOSED curation pipeline — Gopher
  *    rule battery (text_gopher_rules) ∩ near-dup keep-best
  *    survivors (dedup_survivorship) ∩ language allowlist → final
  *    per-source admitted docs/tokens and admission rate. The
  *    end-to-end "what actually ships to tokenization" report tying
  *    the round's gates together.
  *
  * 100 TB shapes: the sweep reads the collision-bounded pair table
  * (×5 spine, ×2 id explode — constants); change-point windows run
  * per-type over |days| rows; curate3 is three narrow per-doc flags
  * joined on doc_id — each input already proven scan-shaped.
  */
object Ext32Queries {

  // ---------------------------------------------------------------
  // sim_threshold_sweep
  // ---------------------------------------------------------------

  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.lshPairs(spark, dir)
      .select(col("id_a"), col("id_b"),
        expr("cast(round(jaccard * 1000000) as bigint)").as("jm"))
    val swept = pairs
      .withColumn("t_deci", explode(sequence(lit(1), lit(5))))
      .filter(col("jm") >= col("t_deci") * 100000L)
    val perT = swept.groupBy("t_deci")
      .agg(count(lit(1)).as("n_pairs"), sum("jm").as("sum_jm"))
    val docsT = swept
      .select(col("t_deci"),
        explode(array(col("id_a"), col("id_b"))).as("id"))
      .groupBy("t_deci")
      .agg(countDistinct("id").as("n_docs_affected"))
    perT.join(docsT, "t_deci")
      .select(col("t_deci").cast("long").as("t_deci"), col("n_pairs"),
        col("n_docs_affected"),
        expr("sum_jm div n_pairs").as("mean_jaccard_micro"))
      .orderBy("t_deci")
  }

  // ---------------------------------------------------------------
  // ts_changepoint_mean
  // ---------------------------------------------------------------

  def changepointMean(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("event_type", "day")
      .agg(sum("vm").as("x"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val splits = daily
      .withColumn("i", count(lit(1)).over(wCum))
      .withColumn("s_l", sum("x").over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum("x").over(wAll))
      .filter(col("i") < col("n")) // split AFTER this day
      // gain = S_l^2/n_l + S_r^2/n_r - S^2/n — doubles over exact
      // integer sums, identical expression text in the oracle
      .withColumn("gain", expr(
        "cast(s_l as double) * cast(s_l as double) / cast(i as double)" +
          " + cast(s - s_l as double) * cast(s - s_l as double)" +
          " / cast(n - i as double)" +
          " - cast(s as double) * cast(s as double) / cast(n as double)"))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("gain").desc, col("day"))
    splits
      .withColumn("rk", row_number().over(wPick))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        col("day").as("split_after_day"),
        expr("s_l div i").as("mean_left_milli"),
        expr("(s - s_l) div (n - i)").as("mean_right_milli"),
        expr("cast(round(gain) as bigint)").as("gain_milli2"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------
  // pipeline_curate3
  // ---------------------------------------------------------------

  def curate3(spark: SparkSession, dir: String): DataFrame = {
    val stopArr = array(TextAnalysis.enStopwords.map(lit): _*)
    val toks = split(trim(col("text")), "\\s+")
    val flagged = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        size(toks).cast("long").as("wc"),
        aggregate(transform(toks, x => length(x).cast("long")),
          lit(0L), (a, x) => a + x).as("alpha_chars"),
        size(array_intersect(transform(toks, x => lower(x)), stopArr))
          .cast("long").as("n_stop"),
        size(array_distinct(toks)).cast("long").as("wc_distinct"))
      .withColumn("gopher_ok",
        col("wc") >= 25 && col("wc") <= 80 &&
          col("alpha_chars") >= col("wc") * 3 &&
          col("alpha_chars") <= col("wc") * 10 &&
          col("n_stop") >= 2 &&
          col("wc") * 40 <= col("wc_distinct") * 100)
      .withColumn("lang_ok", col("lang").isin("en", "es", "de"))
    val labels = NearDupGraph.ccLabels(spark, dir)
    val w = Window.partitionBy("cluster")
      .orderBy(col("n_tokens").desc, col("id"))
    val dropped = labels
      .join(flagged.select(col("doc_id").as("id"),
        col("wc").as("n_tokens")), "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > 1)
      .select(col("id").as("doc_id")).withColumn("is_dup", lit(true))
    flagged.join(dropped, Seq("doc_id"), "left")
      .withColumn("admitted",
        col("gopher_ok") && col("lang_ok") && col("is_dup").isNull)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("admitted"), 1L).otherwise(0L)).as("n_admitted"),
        sum(when(col("admitted"), col("wc")).otherwise(0L))
          .as("tokens_admitted"),
        sum(when(!col("gopher_ok"), 1L).otherwise(0L))
          .as("n_failed_rules"),
        sum(when(!col("lang_ok"), 1L).otherwise(0L))
          .as("n_failed_lang"),
        sum(when(col("is_dup").isNotNull, 1L).otherwise(0L))
          .as("n_dups"))
      .withColumn("admit_rate_micro",
        expr("n_admitted * 1000000 div n_docs"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_threshold_sweep" -> thresholdSweep _,
    "ts_changepoint_mean" -> changepointMean _,
    "pipeline_curate3" -> curate3 _,
  )

  private val enList = TextAnalysis.enStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** LSH verified-pair chain (shared with the dedup oracles). */
  private val pairChain =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id AS id,
      |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
      |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
      |), sig AS (
      |  SELECT id, seed, MIN(md5(seed || '|' || shingle)) AS mh
      |  FROM sh, UNNEST(range(0, 16)) AS sd(seed)
      |  GROUP BY id, seed
      |), bandsig AS (
      |  SELECT id, seed // 4 AS band,
      |    string_agg(mh, ',' ORDER BY seed) AS bsig
      |  FROM sig GROUP BY id, seed // 4
      |), cands AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM bandsig a JOIN bandsig b
      |    ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
      |), sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
      |common AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS common
      |  FROM cands c
      |  JOIN sh a ON a.id = c.id_a
      |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
      |  GROUP BY c.id_a, c.id_b),
      |jp AS (
      |  SELECT id_a, id_b,
      |    CAST(round(CAST(common AS DOUBLE)
      |      / CAST(sa.sz + sb.sz - common AS DOUBLE) * 1000000)
      |      AS BIGINT) AS jm
      |  FROM common
      |  JOIN sizes sa ON sa.id = id_a
      |  JOIN sizes sb ON sb.id = id_b
      |  WHERE CAST(common AS DOUBLE)
      |    / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_threshold_sweep" -> (pairChain +
      """, swept AS (
        |  SELECT jp.*, t.t_deci
        |  FROM jp, (SELECT unnest(range(1, 6)) AS t_deci) t
        |  WHERE jm >= t_deci * 100000
        |), pt AS (
        |  SELECT t_deci, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(jm) AS BIGINT) AS sum_jm
        |  FROM swept GROUP BY t_deci
        |), dt AS (
        |  SELECT t_deci, CAST(count(DISTINCT id) AS BIGINT)
        |    AS n_docs_affected
        |  FROM (SELECT t_deci, id_a AS id FROM swept
        |    UNION ALL SELECT t_deci, id_b FROM swept) u
        |  GROUP BY t_deci)
        |SELECT CAST(pt.t_deci AS BIGINT) AS t_deci, pt.n_pairs,
        |  dt.n_docs_affected,
        |  CAST(pt.sum_jm // pt.n_pairs AS BIGINT) AS mean_jaccard_micro
        |FROM pt JOIN dt ON pt.t_deci = dt.t_deci
        |ORDER BY t_deci""".stripMargin),
    "ts_changepoint_mean" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
        |    CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM events GROUP BY 1, 2
        |), pre AS (
        |  SELECT event_type, day,
        |    CAST(count(*) OVER wc AS BIGINT) AS i,
        |    CAST(sum(x) OVER wc AS BIGINT) AS s_l,
        |    CAST(count(*) OVER wa AS BIGINT) AS n,
        |    CAST(sum(x) OVER wa AS BIGINT) AS s
        |  FROM daily
        |  WINDOW wc AS (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wa AS (PARTITION BY event_type)
        |), g AS (
        |  SELECT *,
        |    cast(s_l as double) * cast(s_l as double) / cast(i as double)
        |      + cast(s - s_l as double) * cast(s - s_l as double)
        |      / cast(n - i as double)
        |      - cast(s as double) * cast(s as double) / cast(n as double)
        |      AS gain
        |  FROM pre WHERE i < n
        |), rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY gain DESC, day) AS rk
        |  FROM g)
        |SELECT event_type, n AS n_days, day AS split_after_day,
        |  CAST(s_l // i AS BIGINT) AS mean_left_milli,
        |  CAST((s - s_l) // (n - i) AS BIGINT) AS mean_right_milli,
        |  CAST(round(gain) AS BIGINT) AS gain_milli2
        |FROM rk WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "pipeline_curate3" -> (pairChain.replace("WITH toks",
      "WITH RECURSIVE toks") +
      s""", edges AS (
         |  SELECT id_a AS a, id_b AS b FROM jp
         |  UNION SELECT id_b, id_a FROM jp),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk(a, b) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b)
         |, labels AS (
         |  SELECT a AS id, MIN(b) AS cluster FROM walk GROUP BY a)
         |, sized AS (
         |  SELECT l.id, l.cluster,
         |    CAST(len(string_split_regex(trim(d.text), '\\s+'))
         |      AS BIGINT) AS n_tokens
         |  FROM labels l JOIN documents d ON d.doc_id = l.id
         |), dropped AS (
         |  SELECT id FROM (
         |    SELECT cluster, id,
         |      ROW_NUMBER() OVER (PARTITION BY cluster
         |        ORDER BY n_tokens DESC, id) AS rn
         |    FROM sized) x WHERE rn > 1
         |), fl AS (
         |  SELECT d.doc_id, d.source, d.lang,
         |    CAST(len(string_split_regex(trim(d.text), '\\s+'))
         |      AS BIGINT) AS wc,
         |    CAST(list_sum(list_transform(
         |      string_split_regex(trim(d.text), '\\s+'),
         |      x -> length(x))) AS BIGINT) AS alpha_chars,
         |    CAST(len(list_distinct(list_filter(list_transform(
         |      string_split_regex(trim(d.text), '\\s+'),
         |      x -> lower(x)), x -> list_contains($enList, x))))
         |      AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(
         |      string_split_regex(trim(d.text), '\\s+'))) AS BIGINT)
         |      AS wc_distinct,
         |    (dr.id IS NOT NULL) AS is_dup
         |  FROM documents d LEFT JOIN dropped dr ON dr.id = d.doc_id
         |), fg AS (
         |  SELECT *,
         |    (wc >= 25 AND wc <= 80 AND alpha_chars >= wc * 3
         |      AND alpha_chars <= wc * 10 AND n_stop >= 2
         |      AND wc * 40 <= wc_distinct * 100) AS gopher_ok,
         |    (lang IN ('en', 'es', 'de')) AS lang_ok
         |  FROM fl)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN gopher_ok AND lang_ok AND NOT is_dup
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
         |  CAST(sum(CASE WHEN gopher_ok AND lang_ok AND NOT is_dup
         |    THEN wc ELSE 0 END) AS BIGINT) AS tokens_admitted,
         |  CAST(sum(CASE WHEN NOT gopher_ok THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_failed_rules,
         |  CAST(sum(CASE WHEN NOT lang_ok THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_failed_lang,
         |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dups,
         |  CAST(sum(CASE WHEN gopher_ok AND lang_ok AND NOT is_dup
         |    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         |    AS admit_rate_micro
         |FROM fg GROUP BY source ORDER BY source""".stripMargin),
  )
}
