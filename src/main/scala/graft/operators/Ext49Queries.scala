package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 12: TextRank keyword extraction, event-sequence
  * pattern mining, and mergeable HLL register sketches.
  *
  *  - `text_textrank_keywords`: PageRank (3 unrolled iterations,
  *    d = 0.85) over the ±2-token co-occurrence graph — the TextRank
  *    keyword extractor. All arithmetic stays on the integer micro
  *    lattice: per-edge contribution `(score_j * w_ji) div wdeg_j`,
  *    damping as `150000 + 85 * sum div 100` — truncating div is
  *    identical across engines for the non-negative lattice.
  *  - `ev_pattern_regex`: MATCH_RECOGNIZE-style sequence patterns
  *    without the dialect: per-user event-initial strings (ordered
  *    by time, unique-id tiebreak) scanned by regex — `v[cs]*p`
  *    (view→…→purchase funnels) and `ee+` (error bursts), both
  *    greedy-leftmost so Java and RE2 agree. Reported as a bounded
  *    (n_funnel, n_burst) user histogram.
  *  - `sketch_hll_merge`: HyperLogLog registers built from md5 — 256
  *    registers (first 2 hex digits), rho = leading-zero count of
  *    the next 40 hash bits + 1 via `41 - length(bin(v))`. Per-day
  *    register tables plus the "ALL" row merged by register-max
  *    prove the sketch's mergeability (the property that makes HLL
  *    the 100 TB distinct-counter); the scaled harmonic denominator
  *    `S = Σ 2^(41-Mj)` and the exact distinct ride along so the
  *    sketch is auditable without float math.
  *
  * 100 TB shapes: TextRank is 3 hash joins against a cached
  * filtered edge list (n_ab ≥ 3 bounds it); the pattern scan is one
  * per-user sort-agg then a per-row regex (codegen) collapsing to a
  * tiny histogram; HLL is two hash aggs (register max, then day
  * rollup) — registers are 256 rows/day no matter the input size.
  */
object Ext49Queries {

  // ---------------------------------------------------------------
  // text_textrank_keywords
  // ---------------------------------------------------------------

  private def cooccurTok(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        lower(col("col")).as("w"))

  def textrankKeywords(spark: SparkSession, dir: String): DataFrame = {
    val tok = cooccurTok(spark, dir)
    val probes = tok.select(col("doc_id"), col("w"),
      explode(array(col("pos") + 1, col("pos") + 2)).as("pos2"))
    val pairs = probes
      .join(tok.select(col("doc_id"), col("pos").as("pos2"),
        col("w").as("w2")), Seq("doc_id", "pos2"))
      .filter(col("w") =!= col("w2"))
      .select(least(col("w"), col("w2")).as("a"),
        greatest(col("w"), col("w2")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 3)
    val und = pairs.select(col("a").as("src"), col("b").as("dst"),
      col("n"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst"),
        col("n")))
    val edges = und.join(
      und.groupBy("src").agg(sum("n").as("wd")), "src").cache()
    var scores = edges.select(col("src").as("word")).distinct()
      .withColumn("sc", lit(1000000L))
    for (_ <- 1 to 3) {
      scores = edges.join(scores, edges("src") === scores("word"))
        .select(col("dst"),
          expr("(sc * n) div wd").as("contrib"))
        .groupBy(col("dst").as("word"))
        .agg((lit(150000L) +
          expr("85 * sum(contrib) div 100")).as("sc"))
    }
    scores.orderBy(col("sc").desc, col("word")).limit(30)
      .select(col("word"), col("sc").as("score_micro"))
  }

  // ---------------------------------------------------------------
  // ev_pattern_regex
  // ---------------------------------------------------------------

  def patternRegex(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(
      col("user_id"), expr("ts div 1000").as("tu"), col("event_id"),
      substring(col("event_type"), 1, 1).as("code"))
    val seqs = ev.groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("tu"), col("event_id"),
          col("code")))),
        x => x.getField("code")), "").as("seq"))
      .select(col("user_id"),
        size(expr("regexp_extract_all(seq, 'v[cs]*p', 0)"))
          .cast("long").as("n_funnel"),
        size(expr("regexp_extract_all(seq, 'ee+', 0)"))
          .cast("long").as("n_burst"))
    seqs.groupBy("n_funnel", "n_burst")
      .agg(count(lit(1)).as("n_users"), min("user_id").as("min_user"))
      .orderBy("n_funnel", "n_burst")
  }

  // ---------------------------------------------------------------
  // sketch_hll_merge
  // ---------------------------------------------------------------

  private def hllRegs(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("hll:"), col("user_id").cast("string")))
    t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id"),
        conv(substring(h, 1, 2), 16, 10).cast("long").as("idx"),
        conv(substring(h, 3, 10), 16, 10).cast("long").as("v"))
      .withColumn("rho",
        when(col("v") === 0, lit(41L))
          .otherwise(lit(41L) - length(bin(col("v")))))
      .groupBy("day", "idx").agg(max("rho").as("mr"))
  }

  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    val regs = hllRegs(spark, dir).cache()
    val ev = t(spark, dir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id"))
    def rollup(r: DataFrame): DataFrame = r.groupBy("day").agg(
      count(lit(1)).as("m_used"),
      sum("mr").as("sum_mr"),
      (expr("sum(shiftleft(cast(1 as bigint), cast(41 - mr as int)))")
        + (lit(256L) - count(lit(1))) * lit(2199023255552L))
        .as("s_scaled"))
    val perDay = rollup(regs)
      .join(ev.groupBy("day")
        .agg(countDistinct("user_id").as("exact_n")), "day")
    val merged = rollup(
      regs.groupBy("idx").agg(max("mr").as("mr"))
        .withColumn("day", lit(-1L)))
      .join(ev.agg(countDistinct("user_id").as("exact_n"))
        .withColumn("day", lit(-1L)), "day")
    perDay.unionByName(merged).orderBy("day")
      .select("day", "m_used", "sum_mr", "s_scaled", "exact_n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_textrank_keywords" -> textrankKeywords _,
    "ev_pattern_regex" -> patternRegex _,
    "sketch_hll_merge" -> hllMerge _,
  )

  private val edgesCte: String =
    """WITH tok AS (
      |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, lower(tk[i]) AS w
      |  FROM (SELECT doc_id,
      |          string_split_regex(trim(text), '\s+') AS tk
      |        FROM documents),
      |    UNNEST(range(1, len(tk) + 1)) AS r(i)
      |), pairs AS (
      |  SELECT least(x.w, y.w) AS a, greatest(x.w, y.w) AS b,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM tok x JOIN tok y ON y.doc_id = x.doc_id
      |    AND y.pos > x.pos AND y.pos <= x.pos + 2
      |  WHERE x.w <> y.w
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 3
      |), und AS (
      |  SELECT a AS src, b AS dst, n FROM pairs
      |  UNION ALL SELECT b, a, n FROM pairs
      |), wdeg AS (
      |  SELECT src, CAST(SUM(n) AS BIGINT) AS wd FROM und GROUP BY src
      |), edges AS (
      |  SELECT u.src, u.dst, u.n, d.wd
      |  FROM und u JOIN wdeg d ON d.src = u.src
      |)""".stripMargin

  private def trIterSql(k: Int): String =
    s""", s$k AS (
       |  SELECT e.dst AS word,
       |    150000 + 85 * SUM((s.sc * e.n) // e.wd) // 100 AS sc
       |  FROM edges e JOIN s${k - 1} s ON s.word = e.src
       |  GROUP BY e.dst
       |)""".stripMargin

  /** 41 - bit_length(v) over the 40 hash bits after the register
    * byte; v = 0 (2^-40 tail) saturates at 41 like the Spark side.
    */
  private val hllRegsCte: String =
    """WITH h AS (
      |  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
      |    user_id,
      |    CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
      |      1, 2))::UBIGINT AS BIGINT) AS idx,
      |    CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)),
      |      3, 10))::UBIGINT AS BIGINT) AS v
      |  FROM events
      |), regs AS (
      |  SELECT day, idx,
      |    MAX(CASE WHEN v = 0 THEN 41
      |        ELSE 41 - length(bin(v)) END) AS mr
      |  FROM h GROUP BY day, idx
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "text_textrank_keywords" ->
      (edgesCte + """, s0 AS (
        |  SELECT DISTINCT src AS word, CAST(1000000 AS BIGINT) AS sc
        |  FROM edges
        |)""".stripMargin +
        (1 to 3).map(trIterSql).mkString +
        """
        |SELECT word, CAST(sc AS BIGINT) AS score_micro FROM s3
        |ORDER BY sc DESC, word LIMIT 30""".stripMargin),
    "ev_pattern_regex" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), ''
        |      ORDER BY epoch_us(ts), event_id) AS seq
        |  FROM events GROUP BY user_id
        |), pat AS (
        |  SELECT user_id,
        |    CAST(len(regexp_extract_all(seq, 'v[cs]*p')) AS BIGINT)
        |      AS n_funnel,
        |    CAST(len(regexp_extract_all(seq, 'ee+')) AS BIGINT)
        |      AS n_burst
        |  FROM seqs)
        |SELECT n_funnel, n_burst, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(min(user_id) AS BIGINT) AS min_user
        |FROM pat GROUP BY n_funnel, n_burst
        |ORDER BY n_funnel, n_burst""".stripMargin,
    "sketch_hll_merge" ->
      (hllRegsCte + """, day_rows AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS m_used,
        |    CAST(SUM(mr) AS BIGINT) AS sum_mr,
        |    CAST(SUM(CAST(1 AS BIGINT) << (41 - mr))
        |      + (256 - count(*)) * 2199023255552 AS BIGINT) AS s_scaled
        |  FROM regs GROUP BY day
        |), merged AS (
        |  SELECT CAST(-1 AS BIGINT) AS day,
        |    CAST(count(*) AS BIGINT) AS m_used,
        |    CAST(SUM(mr) AS BIGINT) AS sum_mr,
        |    CAST(SUM(CAST(1 AS BIGINT) << (41 - mr))
        |      + (256 - count(*)) * 2199023255552 AS BIGINT) AS s_scaled
        |  FROM (SELECT idx, MAX(mr) AS mr FROM regs GROUP BY idx)
        |), ex AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n
        |  FROM h GROUP BY day
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT),
        |    CAST(count(DISTINCT user_id) AS BIGINT) FROM h
        |)
        |SELECT r.day, r.m_used, r.sum_mr, r.s_scaled, e.exact_n
        |FROM (SELECT * FROM day_rows UNION ALL SELECT * FROM merged) r
        |JOIN ex e ON e.day = r.day
        |ORDER BY r.day""".stripMargin),
  )
}
