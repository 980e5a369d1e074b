package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 batch C: the experimentation family's event-study curve
  * and heterogeneous-effect (uplift) report, plus chrF — the
  * character-n-gram F-score that complements eval_bleu the way recall
  * complements precision.
  */
object Ext76Queries {

  /** The ev_ab_* cutover instant (2024-01-16T00:00:00Z) in epoch days
    * — 1705363200 s / 86400.
    */
  private val CutDay = 19738L

  // ---------------------------------------------------------------
  // ev_event_study
  // ---------------------------------------------------------------

  /** DiD event-study curve: for each day −7..+7 relative to the
    * ev_ab_did cutover, the treated-minus-control mean gap net of the
    * PRE-window baseline gap — the per-period generalization of
    * ev_ab_did's single contrast (the plot a launch review reads to
    * check parallel pre-trends and effect onset). Sums and counts are
    * BIGINT-exact; the four-mean contrast touches doubles once with
    * identical expression text, rounded to micro.
    *
    * 100 TB shape: one (relday, arm) conditional aggregate collapses
    * the corpus to ≤ 15 rows; the pre-baseline is a second aggregate
    * OVER THOSE CELLS (never a second corpus pass), broadcast as one
    * row.
    */
  def eventStudy(spark: SparkSession, dir: String): DataFrame = {
    val cells = t(spark, dir, "events")
      .select((col("user_id") % 2).as("grp"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      // tsec >= 0, so truncating div == floor (matches epoch_us //)
      .withColumn("relday", expr("tsec div 86400") - lit(CutDay))
      .filter(col("relday").between(-7L, 7L))
      .groupBy("relday")
      .agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("grp") === 0, col("vm")).otherwise(0L)).as("s_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("grp") === 1, col("vm")).otherwise(0L)).as("s_b"))
      .cache() // per-day rows + the pre-baseline share it
    val base = cells.filter(col("relday") < 0)
      .agg(sum("n_a").as("pn_a"), sum("s_a").as("ps_a"),
        sum("n_b").as("pn_b"), sum("s_b").as("ps_b"))
    cells.crossJoin(broadcast(base))
      .select(col("relday"), col("n_a"), col("n_b"),
        expr("case when n_a = 0 then null else s_a div n_a end")
          .as("mean_a_milli"),
        expr("case when n_b = 0 then null else s_b div n_b end")
          .as("mean_b_milli"),
        expr(
          """CASE WHEN n_a = 0 OR n_b = 0 OR pn_a = 0 OR pn_b = 0
            |THEN NULL
            |ELSE cast(round(((cast(s_b as double) / cast(n_b as double)
            |    - cast(s_a as double) / cast(n_a as double))
            |  - (cast(ps_b as double) / cast(pn_b as double)
            |    - cast(ps_a as double) / cast(pn_a as double)))
            |  * 1000) as bigint) END""".stripMargin)
          .as("effect_micro"))
      .orderBy("relday")
  }

  // ---------------------------------------------------------------
  // ev_uplift_bins
  // ---------------------------------------------------------------

  /** Heterogeneous treatment effect by pre-period activity: users are
    * binned on their PRE-cutover event count (fixed width 8, top bin
    * open — pre-treatment, so the split is unconfounded), and each
    * bin reports the post-period treated-vs-control mean gap. The
    * segment-level readout behind "who does the launch actually
    * help"; cohort = users with ≥1 pre event (a post-only user has no
    * unconfounded bin).
    *
    * 100 TB shape: one pre-period per-user count (keyed aggregate),
    * one keyed join of post events to the user→bin map (shuffle join
    * — the map grows with the user base, never broadcast), one ≤ 5×2
    * cell aggregate.
    */
  def upliftBins(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .withColumn("d0", expr("tsec div 86400"))
    val bins = ev.filter(col("d0") < CutDay)
      .groupBy("user_id").agg(count(lit(1)).as("n_pre"))
      .withColumn("bin", least(expr("n_pre div 8"), lit(4L)))
      .select("user_id", "bin")
    ev.filter(col("d0") >= CutDay)
      .join(bins, "user_id")
      .withColumn("grp", col("user_id") % 2)
      .groupBy("bin")
      .agg(
        countDistinct(when(col("grp") === 0, col("user_id")))
          .as("n_users_a"),
        countDistinct(when(col("grp") === 1, col("user_id")))
          .as("n_users_b"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("grp") === 0, col("vm")).otherwise(0L)).as("s_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("grp") === 1, col("vm")).otherwise(0L)).as("s_b"))
      .select(col("bin"), col("n_users_a"), col("n_users_b"),
        col("n_a"), col("n_b"),
        expr("s_a div greatest(n_a, 1)").as("mean_a_milli"),
        expr("s_b div greatest(n_b, 1)").as("mean_b_milli"),
        expr(
          """CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
            |ELSE cast(round((cast(s_b as double) / cast(n_b as double)
            |  - cast(s_a as double) / cast(n_a as double))
            |  * 1000) as bigint) END""".stripMargin)
          .as("uplift_micro"))
      .orderBy("bin")
  }

  // ---------------------------------------------------------------
  // eval_chrf
  // ---------------------------------------------------------------

  /** chrF1 over the simhash near-dup pairs: character 3-gram
    * precision AND recall (whitespace collapsed, lowercased), F1
    * combined — the character-level complement of eval_bleu's
    * word-level precision (robust to tokenization/morphology, the
    * standard second MT metric). The clipped-overlap numerator is
    * symmetric, so one (doc, gram) join serves both directions.
    *
    * 100 TB shape: trigram counts are keyed aggregates over ONLY the
    * paired docs (semi-joined first); the clip join is keyed on
    * (pair, gram); nothing touches the full corpus beyond the banded
    * pair search.
    */
  def evalChrf(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select("id_a", "id_b")
    val ids = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val tg = t(spark, dir, "documents")
      .join(broadcast(ids), "doc_id")
      .withColumn("txt",
        regexp_replace(lower(trim(col("text"))), "\\s+", " "))
      .filter(length(col("txt")) >= 3)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(txt) - 2)")).as("pos"),
        col("txt"))
      .select(col("doc_id"), expr("substring(txt, pos, 3)").as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .cache() // clip join (both sides) + totals
    val tot = tg.groupBy("doc_id").agg(sum("c").as("n"))
    // same-parent self-join: rename the join columns on each side
    val clip = pairs
      .join(tg.select(col("doc_id").as("id_b"), col("g").as("gb"),
        col("c").as("c_cand")), Seq("id_b"))
      .join(tg.select(col("doc_id").as("ra"), col("g").as("g_ref"),
        col("c").as("c_ref")),
        col("id_a") === col("ra") && col("gb") === col("g_ref"),
        "left")
      .groupBy("id_a", "id_b")
      .agg(sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
        .as("m_clip"))
    pairs
      .join(tot.select(col("doc_id").as("id_a"),
        col("n").as("n_tg_ref")), "id_a")
      .join(tot.select(col("doc_id").as("id_b"),
        col("n").as("n_tg_cand")), "id_b")
      .join(clip, Seq("id_a", "id_b"))
      .withColumn("chrp_r6", expr(
        "round(cast(m_clip as double) / cast(n_tg_cand as double), 6)"))
      .withColumn("chrr_r6", expr(
        "round(cast(m_clip as double) / cast(n_tg_ref as double), 6)"))
      .withColumn("chrf1_r6", expr(
        """CASE WHEN m_clip = 0 THEN 0.0d
          |ELSE round(2.0d
          |  * (cast(m_clip as double) / cast(n_tg_cand as double))
          |  * (cast(m_clip as double) / cast(n_tg_ref as double))
          |  / (cast(m_clip as double) / cast(n_tg_cand as double)
          |   + cast(m_clip as double) / cast(n_tg_ref as double)), 6)
          |END""".stripMargin))
      .select("id_a", "id_b", "n_tg_ref", "n_tg_cand", "m_clip",
        "chrp_r6", "chrr_r6", "chrf1_r6")
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_event_study" -> eventStudy _,
    "ev_uplift_bins" -> upliftBins _,
    "eval_chrf" -> evalChrf _,
  )

  val oracle: Map[String, String] = Map(
    "ev_event_study" ->
      """WITH ev AS (
        |  SELECT user_id % 2 AS grp,
        |    epoch_us(ts) // 86400000000 - 19738 AS relday,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |  WHERE epoch_us(ts) // 86400000000 - 19738 BETWEEN -7 AND 7
        |), cells AS (
        |  SELECT relday,
        |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN grp = 0 THEN vm ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN grp = 1 THEN vm ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM ev GROUP BY relday
        |), base AS (
        |  SELECT CAST(SUM(n_a) AS BIGINT) AS pn_a,
        |    CAST(SUM(s_a) AS BIGINT) AS ps_a,
        |    CAST(SUM(n_b) AS BIGINT) AS pn_b,
        |    CAST(SUM(s_b) AS BIGINT) AS ps_b
        |  FROM cells WHERE relday < 0)
        |SELECT c.relday, c.n_a, c.n_b,
        |  CASE WHEN c.n_a = 0 THEN NULL
        |    ELSE c.s_a // c.n_a END AS mean_a_milli,
        |  CASE WHEN c.n_b = 0 THEN NULL
        |    ELSE c.s_b // c.n_b END AS mean_b_milli,
        |  CASE WHEN c.n_a = 0 OR c.n_b = 0 OR b.pn_a = 0 OR b.pn_b = 0
        |  THEN NULL
        |  ELSE CAST(round(((CAST(c.s_b AS DOUBLE) / CAST(c.n_b AS DOUBLE)
        |      - CAST(c.s_a AS DOUBLE) / CAST(c.n_a AS DOUBLE))
        |    - (CAST(b.ps_b AS DOUBLE) / CAST(b.pn_b AS DOUBLE)
        |      - CAST(b.ps_a AS DOUBLE) / CAST(b.pn_a AS DOUBLE)))
        |    * 1000) AS BIGINT) END AS effect_micro
        |FROM cells c, base b
        |ORDER BY c.relday""".stripMargin,
    "ev_uplift_bins" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS d0,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), bins AS (
        |  SELECT user_id,
        |    least(CAST(COUNT(*) AS BIGINT) // 8, 4) AS bin
        |  FROM ev WHERE d0 < 19738 GROUP BY user_id
        |), post AS (
        |  SELECT b.bin, e.user_id, e.user_id % 2 AS grp, e.vm
        |  FROM ev e JOIN bins b ON b.user_id = e.user_id
        |  WHERE e.d0 >= 19738
        |), cells AS (
        |  SELECT bin,
        |    CAST(COUNT(DISTINCT CASE WHEN grp = 0 THEN user_id END)
        |      AS BIGINT) AS n_users_a,
        |    CAST(COUNT(DISTINCT CASE WHEN grp = 1 THEN user_id END)
        |      AS BIGINT) AS n_users_b,
        |    CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN grp = 0 THEN vm ELSE 0 END) AS BIGINT)
        |      AS s_a,
        |    CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN grp = 1 THEN vm ELSE 0 END) AS BIGINT)
        |      AS s_b
        |  FROM post GROUP BY bin)
        |SELECT bin, n_users_a, n_users_b, n_a, n_b,
        |  s_a // greatest(n_a, 1) AS mean_a_milli,
        |  s_b // greatest(n_b, 1) AS mean_b_milli,
        |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
        |  ELSE CAST(round((CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |    - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |    * 1000) AS BIGINT) END AS uplift_micro
        |FROM cells ORDER BY bin""".stripMargin,
    "eval_chrf" ->
      """WITH tokrows AS (
        |  SELECT doc_id AS id,
        |    md5(unnest(string_split_regex(trim(text), '\s+'))) AS h
        |  FROM documents
        |), votes AS (
        |  SELECT id, bit,
        |    SUM(CASE WHEN
        |      ((strpos('0123456789abcdef', substr(h, bit // 4 + 1, 1)) - 1)
        |        & (1 << (3 - bit % 4))) > 0 THEN 1 ELSE -1 END) AS v
        |  FROM tokrows, UNNEST(range(0, 60)) AS b(bit)
        |  GROUP BY id, bit
        |), fps AS (
        |  SELECT id,
        |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (59 - bit)
        |        ELSE 0 END) AS BIGINT) AS fp
        |  FROM votes GROUP BY id
        |), pairs AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM fps a JOIN fps b ON a.id < b.id
        |  WHERE bit_count(xor(a.fp, b.fp)) <= 5
        |), ids AS (
        |  SELECT DISTINCT id_a AS doc_id FROM pairs
        |  UNION SELECT DISTINCT id_b FROM pairs
        |), dtxt AS (
        |  SELECT d.doc_id,
        |    regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g') AS txt
        |  FROM documents d JOIN ids i ON i.doc_id = d.doc_id
        |), tg AS (
        |  SELECT doc_id, substr(txt, CAST(pos AS INT), 3) AS g,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM dtxt, UNNEST(range(1, length(txt) - 1)) AS pp(pos)
        |  WHERE length(txt) >= 3
        |  GROUP BY doc_id, substr(txt, CAST(pos AS INT), 3)
        |), tot AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
        |  FROM tg GROUP BY doc_id
        |), clip AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(SUM(least(cb.c, COALESCE(rb.c, 0))) AS BIGINT)
        |      AS m_clip
        |  FROM pairs p
        |  JOIN tg cb ON cb.doc_id = p.id_b
        |  LEFT JOIN tg rb ON rb.doc_id = p.id_a AND rb.g = cb.g
        |  GROUP BY p.id_a, p.id_b)
        |SELECT p.id_a, p.id_b, tr.n AS n_tg_ref, tc.n AS n_tg_cand,
        |  c.m_clip,
        |  round(CAST(c.m_clip AS DOUBLE) / CAST(tc.n AS DOUBLE), 6)
        |    AS chrp_r6,
        |  round(CAST(c.m_clip AS DOUBLE) / CAST(tr.n AS DOUBLE), 6)
        |    AS chrr_r6,
        |  CASE WHEN c.m_clip = 0 THEN 0.0
        |  ELSE round(2.0
        |    * (CAST(c.m_clip AS DOUBLE) / CAST(tc.n AS DOUBLE))
        |    * (CAST(c.m_clip AS DOUBLE) / CAST(tr.n AS DOUBLE))
        |    / (CAST(c.m_clip AS DOUBLE) / CAST(tc.n AS DOUBLE)
        |     + CAST(c.m_clip AS DOUBLE) / CAST(tr.n AS DOUBLE)), 6)
        |  END AS chrf1_r6
        |FROM pairs p
        |JOIN tot tr ON tr.doc_id = p.id_a
        |JOIN tot tc ON tc.doc_id = p.id_b
        |JOIN clip c ON c.id_a = p.id_a AND c.id_b = p.id_b
        |ORDER BY p.id_a, p.id_b""".stripMargin,
  )
}
