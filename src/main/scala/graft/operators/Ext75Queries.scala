package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 batch B: storage-layout data skipping, the AMS frequency-
  * moment sketch, multi-probe LSH (the recall knob a production ANN
  * index turns before adding tables), and corpus BLEU over near-dup
  * pairs (the surface-overlap score an eval harness reports next to
  * the n-gram precisions).
  */
object Ext75Queries {

  // ---------------------------------------------------------------
  // sketch_ams_f2
  // ---------------------------------------------------------------

  /** AMS (tug-of-war) estimate of the second frequency moment
    * F2 = Σ_u c_u² of the user-id stream — the self-join-size /
    * repeat-rate statistic a planner reads from a sketch instead of a
    * full aggregation. 16 independent estimators: sign_i(u) = ±1 from
    * md5 hex parity of "ams:i:u", X_i = (Σ_u sign_i(u)·c_u)², estimate
    * = lower median (8th of 16 ordered by (X, i)); the exact F2 rides
    * along as the audit. Everything is BIGINT-exact.
    *
    * 100 TB shape: one per-user count aggregate collapses the corpus
    * (in production the sign·increment folds INTO that same combiner,
    * streaming-style); the 16× expansion is a projection-explode over
    * the already-aggregated user table, and the median runs on 16
    * rows. No second pass over raw events.
    */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .cache() // estimators + the exact-F2 audit share it
    val exact = counts.agg(sum(col("c") * col("c")).as("exact_f2"))
    val est = counts
      .select(col("user_id"), col("c"),
        explode(lit((0 until 16).toArray)).as("i"))
      .withColumn("sign", when(
        conv(substring(md5(concat(lit("ams:"), col("i").cast("string"),
          lit(":"), col("user_id").cast("string"))), 1, 1), 16, 10)
          .cast("long") % 2 === 0, 1L).otherwise(-1L))
      .groupBy("i").agg(sum(col("sign") * col("c")).as("s"))
      .withColumn("x", col("s") * col("s"))
    // 16 rows by construction — bounded-domain global window
    val ranked = est.withColumn("rn",
      row_number().over(Window.orderBy(col("x"), col("i"))))
    ranked.agg(
        max(when(col("rn") === 8, col("x"))).as("est_median"),
        min("x").as("est_min"), max("x").as("est_max"))
      .crossJoin(broadcast(exact))
      .withColumn("k", lit(16L))
      // |med − f2| ≥ 0, so truncating div == floor on both engines
      .withColumn("rel_err_abs_micro", expr(
        "abs(est_median - exact_f2) * 1000000 div exact_f2"))
      .select("k", "est_median", "est_min", "est_max", "exact_f2",
        "rel_err_abs_micro")
  }

  // ---------------------------------------------------------------
  // layout_zonemap_prune
  // ---------------------------------------------------------------

  /** Zone-map (min/max per file) data skipping under two physical
    * layouts — natural order (files cut on l_orderkey ranges, the
    * as-ingested layout) vs clustered (files cut on l_shipdate
    * ranges, the sort-on-write layout) — scored against six
    * deterministic ship-date window predicates: files read, rows
    * scanned, rows actually matched, and the read amplification. THE
    * quantitative case for layout_zorder/layout_rangeparts: the same
    * predicate reads ~every file under natural order and ~one file
    * when clustered.
    *
    * 100 TB shape: one pass over lineitem computes both file
    * assignments (pure projections off a 1-row bounds broadcast);
    * zone maps are one keyed aggregate (≤ 65 rows per layout), day
    * counts one more (|days| rows); every join after that runs on
    * bounded spines (65×6, |days|×6).
    */
  def zonemapPrune(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        // l_shipdate is parquet TIMESTAMP_NTZ; the session is pinned
        // UTC, so the cast is the identity wall-clock mapping DuckDB's
        // epoch_us applies to its naive TIMESTAMP
        expr("unix_micros(cast(l_shipdate as timestamp))" +
          " div 86400000000").as("day"))
    val bounds = broadcast(li.agg(max("l_orderkey").as("max_ok"),
      min("day").as("min_d"), max("day").as("max_d")))
    val base = li.crossJoin(bounds)
      .withColumn("file_nat", expr("l_orderkey div (max_ok div 64 + 1)"))
      .withColumn("file_clu", expr(
        "(day - min_d) div ((max_d - min_d) div 64 + 1)"))
      .cache() // two zone-map aggregates + the day histogram share it
    def zones(fileCol: String, layout: String): DataFrame =
      base.groupBy(col(fileCol).as("file_id"))
        .agg(min("day").as("zmin"), max("day").as("zmax"),
          count(lit(1)).as("n_rows"))
        .withColumn("layout", lit(layout))
    val zm = zones("file_nat", "natural")
      .unionByName(zones("file_clu", "clustered"))
    // six window predicates derived from the day bounds: start at
    // min_d + q·span/8, width span/12 — all BIGINT, non-negative
    val preds = bounds
      .select(explode(lit((0 until 6).toArray)).as("qi"),
        col("min_d"), col("max_d"))
      .withColumn("q", col("qi").cast("long"))
      .withColumn("span", col("max_d") - col("min_d"))
      .withColumn("lo", expr("min_d + q * (span div 8)"))
      .withColumn("hi", expr("min_d + q * (span div 8) + span div 12"))
      .select("q", "lo", "hi")
    val dayCounts = base.groupBy("day").agg(count(lit(1)).as("n"))
    val matched = dayCounts.crossJoin(broadcast(preds))
      .filter(col("day") >= col("lo") && col("day") <= col("hi"))
      .groupBy("q").agg(sum("n").as("rows_matched"))
    zm.crossJoin(broadcast(preds))
      .groupBy("layout", "q", "lo", "hi")
      .agg(count(lit(1)).as("files_total"),
        sum(when(col("zmax") >= col("lo") && col("zmin") <= col("hi"),
          1L).otherwise(0L)).as("files_read"),
        sum(when(col("zmax") >= col("lo") && col("zmin") <= col("hi"),
          col("n_rows")).otherwise(0L)).as("rows_scanned"))
      .join(matched, Seq("q"), "left")
      .na.fill(0L, Seq("rows_matched"))
      .withColumn("read_amp_micro", expr(
        "rows_scanned * 1000000 div greatest(rows_matched, 1)"))
      .select("layout", "q", "lo", "hi", "files_total", "files_read",
        "rows_scanned", "rows_matched", "read_amp_micro")
      .orderBy("layout", "q")
  }

  // ---------------------------------------------------------------
  // sim_ann_multiprobe
  // ---------------------------------------------------------------

  /** Multi-probe LSH: at planes=8 a single-bucket lookup (1/256 of
    * the corpus in expectation) misses most true neighbours, so each
    * query probes its own bucket PLUS the 8 buckets at Hamming
    * distance 1 — the standard recall knob that multiplies candidate
    * coverage 9× without building more tables (no extra index
    * storage, no corpus re-hash). Candidates rerank exactly; n_cand
    * reports the probe set's size per query.
    *
    * 100 TB shape: the corpus is hashed once (narrow projection); the
    * probe expansion is on the 8-row QUERY side only (9 probes per
    * query, broadcast); the candidate join is a keyed equi-join on
    * bucket — fan-out bounded by 9 buckets × bucket occupancy, never
    * all-pairs.
    */
  def simAnnMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    val planes = 8; val k = 5
    val emb = t(spark, dir, "embeddings")
    val c = emb.select(col("vec_id").as("n_id"),
        col("embedding").as("n_vec"))
      .withColumn("bucket",
        Similarity.srpBucket(col("n_vec"), planes, 64))
      .withColumn("n_nrm", Similarity.norm(col("n_vec")))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      .withColumn("q_bucket",
        Similarity.srpBucket(col("q_vec"), planes, 64))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("q_bucket"),
        explode(lit((-1 until planes).toArray)).as("flip"))
      // flip = -1 is the exact bucket; flip = i toggles bit i+1.
      // The 9 probe strings per query are pairwise distinct, so a
      // neighbour (one bucket each) matches at most one probe — no
      // candidate dedup pass needed.
      .withColumn("probe", expr(
        """CASE WHEN flip = -1 THEN q_bucket
          |ELSE concat(substring(q_bucket, 1, flip),
          |  CASE WHEN substring(q_bucket, flip + 1, 1) = '1'
          |    THEN '0' ELSE '1' END,
          |  substring(q_bucket, flip + 2, 8)) END""".stripMargin))
    val sim = c.join(broadcast(q),
        col("bucket") === col("probe") && col("n_id") =!= col("q_id"))
      .withColumn("sim", round(
        Similarity.dot(col("q_vec"), col("n_vec"))
          / (col("q_nrm") * col("n_nrm")), 6))
    val wc = Window.partitionBy("q_id")
    val wr = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("n_id"))
    sim.withColumn("n_cand", count(lit(1)).over(wc))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "sim", "n_cand", "rank")
      .orderBy("q_id", "rank")
  }

  // ---------------------------------------------------------------
  // eval_bleu
  // ---------------------------------------------------------------

  /** Corpus BLEU-2 over the simhash near-dup pairs (reference = lower
    * id, candidate = higher): clipped modified n-gram precision for
    * n=1,2 plus the brevity penalty — the surface-overlap score an
    * eval harness reports for paraphrase/near-dup audits, computed on
    * exactly the pair set the dedup ladder already surfaces. Counts
    * and clipped sums are BIGINT-exact; only the final
    * BP·exp(½(ln p₁ + ln p₂)) touches doubles (identical expression
    * text in the oracle, rounded to 6).
    *
    * 100 TB shape: the pair set is the banded (pigeonhole-exact)
    * simhash candidate search — never all-pairs; token/bigram counts
    * are keyed aggregates over ONLY the paired docs (semi-joined
    * first); per-pair clipping is a keyed (doc, gram) join.
    */
  def evalBleu(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select("id_a", "id_b")
    val ids = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val tk = t(spark, dir, "documents")
      .join(broadcast(ids), "doc_id")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos"), lower(col("col")).as("tok"))
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val uni = tk.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("c")).cache() // clip join + totals
    val bi = tk
      .withColumn("nxt", lead("tok", 1).over(wd))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"),
        concat(col("tok"), lit(" "), col("nxt")).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c")).cache()
    val totU = uni.groupBy("doc_id").agg(sum("c").as("n"))
    val totB = bi.groupBy("doc_id").agg(sum("c").as("n"))
    // both sides project the SAME cached count frame: rename the join
    // columns on each side so the self-join predicate binds distinct
    // attributes (the AMBIGUOUS_SELF_JOIN rule)
    def clipped(cnt: DataFrame, gram: String, out: String): DataFrame =
      pairs.join(cnt.select(col("doc_id").as("id_b"),
          col(gram).as("g"), col("c").as("c_cand")), Seq("id_b"))
        .join(cnt.select(col("doc_id").as("ra"),
          col(gram).as("g_ref"), col("c").as("c_ref")),
          col("id_a") === col("ra") && col("g") === col("g_ref"),
          "left")
        .groupBy("id_a", "id_b")
        .agg(sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
          .as(out))
    val p1 = clipped(uni, "tok", "p1_num")
    val p2 = clipped(bi, "bg", "p2_num")
    pairs
      .join(totU.select(col("doc_id").as("id_b"),
        col("n").as("cand_toks")), "id_b")
      .join(totU.select(col("doc_id").as("id_a"),
        col("n").as("ref_toks")), "id_a")
      .join(totB.select(col("doc_id").as("id_b"),
        col("n").as("p2_den")), "id_b")
      .join(p1, Seq("id_a", "id_b"))
      .join(p2, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("p2_num"))
      .withColumn("bleu_r6", expr(
        """CASE WHEN p1_num = 0 OR p2_num = 0 OR p2_den = 0 THEN 0.0d
          |ELSE round(least(1.0d, exp(1.0d
          |    - cast(ref_toks as double) / cast(cand_toks as double)))
          |  * exp(0.5d
          |    * (ln(cast(p1_num as double) / cast(cand_toks as double))
          |     + ln(cast(p2_num as double) / cast(p2_den as double)))),
          |  6) END""".stripMargin))
      .select("id_a", "id_b", "ref_toks", "cand_toks", "p1_num",
        "p2_num", "p2_den", "bleu_r6")
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_ams_f2" -> amsF2 _,
    "layout_zonemap_prune" -> zonemapPrune _,
    "sim_ann_multiprobe" -> simAnnMultiprobe _,
    "eval_bleu" -> evalBleu _,
  )

  /** Simhash pair derivation shared by the eval_bleu oracle — the
    * brute-force all-pairs filter is exact at maxHamming=5 by the
    * pigeonhole argument (the dedup_simhash_pairs convention).
    */
  private val simhashPairsSql: String =
    """tokrows AS (
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
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sketch_ams_f2" ->
      """WITH counts AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY user_id
        |), ex AS (
        |  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_f2 FROM counts
        |), est AS (
        |  SELECT i, CAST(SUM(CASE WHEN
        |      substr(md5('ams:' || i || ':' || CAST(user_id AS VARCHAR)),
        |        1, 1) IN ('0','2','4','6','8','a','c','e')
        |      THEN c ELSE -c END) AS BIGINT) AS s
        |  FROM counts, UNNEST(range(0, 16)) AS ii(i)
        |  GROUP BY i
        |), xs AS (
        |  SELECT i, s * s AS x,
        |    ROW_NUMBER() OVER (ORDER BY s * s, i) AS rn
        |  FROM est)
        |SELECT CAST(16 AS BIGINT) AS k,
        |  CAST(MAX(CASE WHEN rn = 8 THEN x END) AS BIGINT)
        |    AS est_median,
        |  CAST(MIN(x) AS BIGINT) AS est_min,
        |  CAST(MAX(x) AS BIGINT) AS est_max,
        |  MAX(e.exact_f2) AS exact_f2,
        |  CAST(abs(MAX(CASE WHEN rn = 8 THEN x END) - MAX(e.exact_f2))
        |    * 1000000 // MAX(e.exact_f2) AS BIGINT)
        |    AS rel_err_abs_micro
        |FROM xs, ex e""".stripMargin,
    "layout_zonemap_prune" ->
      """WITH li AS (
        |  SELECT l_orderkey, epoch_us(l_shipdate) // 86400000000 AS day
        |  FROM lineitem
        |), bounds AS (
        |  SELECT CAST(MAX(l_orderkey) AS BIGINT) AS max_ok,
        |    CAST(MIN(day) AS BIGINT) AS min_d,
        |    CAST(MAX(day) AS BIGINT) AS max_d
        |  FROM li
        |), base AS (
        |  SELECT l.l_orderkey, l.day,
        |    l.l_orderkey // (b.max_ok // 64 + 1) AS file_nat,
        |    (l.day - b.min_d) // ((b.max_d - b.min_d) // 64 + 1)
        |      AS file_clu
        |  FROM li l, bounds b
        |), zm AS (
        |  SELECT 'natural' AS layout, file_nat AS file_id,
        |    MIN(day) AS zmin, MAX(day) AS zmax,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM base GROUP BY file_nat
        |  UNION ALL
        |  SELECT 'clustered' AS layout, file_clu AS file_id,
        |    MIN(day) AS zmin, MAX(day) AS zmax,
        |    CAST(COUNT(*) AS BIGINT) AS n_rows
        |  FROM base GROUP BY file_clu
        |), preds AS (
        |  SELECT CAST(q AS BIGINT) AS q,
        |    b.min_d + q * ((b.max_d - b.min_d) // 8) AS lo,
        |    b.min_d + q * ((b.max_d - b.min_d) // 8)
        |      + (b.max_d - b.min_d) // 12 AS hi
        |  FROM bounds b, UNNEST(range(0, 6)) AS qq(q)
        |), days AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM base GROUP BY day
        |), matched AS (
        |  SELECT p.q, CAST(SUM(d.n) AS BIGINT) AS rows_matched
        |  FROM preds p JOIN days d ON d.day BETWEEN p.lo AND p.hi
        |  GROUP BY p.q
        |), stats AS (
        |  SELECT z.layout, p.q, p.lo, p.hi,
        |    CAST(COUNT(*) AS BIGINT) AS files_total,
        |    CAST(SUM(CASE WHEN z.zmax >= p.lo AND z.zmin <= p.hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
        |    CAST(SUM(CASE WHEN z.zmax >= p.lo AND z.zmin <= p.hi
        |      THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
        |  FROM zm z, preds p
        |  GROUP BY z.layout, p.q, p.lo, p.hi)
        |SELECT s.layout, s.q, s.lo, s.hi, s.files_total, s.files_read,
        |  s.rows_scanned, COALESCE(m.rows_matched, 0) AS rows_matched,
        |  CAST(s.rows_scanned * 1000000
        |    // greatest(COALESCE(m.rows_matched, 0), 1) AS BIGINT)
        |    AS read_amp_micro
        |FROM stats s LEFT JOIN matched m ON m.q = s.q
        |ORDER BY s.layout, s.q""".stripMargin,
    "sim_ann_multiprobe" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), contrib AS (
        |  SELECT vec_id, p,
        |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
        |      AS c
        |  FROM ee, UNNEST(range(0, 8)) AS pl(p)
        |  GROUP BY vec_id, p
        |), buckets AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY p) AS bucket
        |  FROM contrib GROUP BY vec_id
        |), probes AS (
        |  SELECT b.vec_id AS q_id,
        |    CASE WHEN f.flip = -1 THEN b.bucket
        |    ELSE substr(b.bucket, 1, CAST(f.flip AS INT))
        |      || (CASE WHEN substr(b.bucket, CAST(f.flip AS INT) + 1, 1)
        |            = '1' THEN '0' ELSE '1' END)
        |      || substr(b.bucket, CAST(f.flip AS INT) + 2, 8) END
        |      AS probe
        |  FROM buckets b, UNNEST(range(-1, 8)) AS f(flip)
        |  WHERE b.vec_id < 8
        |), cands AS (
        |  SELECT p.q_id, be.vec_id AS n_id
        |  FROM probes p
        |  JOIN buckets be
        |    ON be.bucket = p.probe AND be.vec_id <> p.q_id
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), sims AS (
        |  SELECT c.q_id, c.n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM cands c
        |  JOIN dots d ON d.q_id = c.q_id AND d.n_id = c.n_id
        |  JOIN norms nq ON nq.vec_id = c.q_id
        |  JOIN norms ne ON ne.vec_id = c.n_id
        |), ranked AS (
        |  SELECT q_id, n_id, sim,
        |    CAST(COUNT(*) OVER (PARTITION BY q_id) AS BIGINT) AS n_cand,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
        |      AS rank
        |  FROM sims)
        |SELECT q_id, n_id, sim, n_cand, CAST(rank AS BIGINT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "eval_bleu" ->
      (s"""WITH $simhashPairsSql, ids AS (
        |  SELECT DISTINCT id_a AS doc_id FROM pairs
        |  UNION SELECT DISTINCT id_b FROM pairs
        |), tk AS (
        |  SELECT d.doc_id,
        |    generate_subscripts(
        |      string_split_regex(trim(d.text), '\\s+'), 1) AS pos,
        |    lower(unnest(string_split_regex(trim(d.text), '\\s+')))
        |      AS tok
        |  FROM documents d JOIN ids i ON i.doc_id = d.doc_id
        |), uni AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk GROUP BY doc_id, tok
        |), bg AS (
        |  SELECT a.doc_id, a.tok || ' ' || b.tok AS bg,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM tk a JOIN tk b
        |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  GROUP BY a.doc_id, a.tok || ' ' || b.tok
        |), tot_u AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
        |  FROM uni GROUP BY doc_id
        |), tot_b AS (
        |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n
        |  FROM bg GROUP BY doc_id
        |), p1 AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(SUM(least(cu.c, COALESCE(ru.c, 0))) AS BIGINT)
        |      AS p1_num
        |  FROM pairs p
        |  JOIN uni cu ON cu.doc_id = p.id_b
        |  LEFT JOIN uni ru ON ru.doc_id = p.id_a AND ru.tok = cu.tok
        |  GROUP BY p.id_a, p.id_b
        |), p2 AS (
        |  SELECT p.id_a, p.id_b,
        |    CAST(SUM(least(cb.c, COALESCE(rb.c, 0))) AS BIGINT)
        |      AS p2_num
        |  FROM pairs p
        |  JOIN bg cb ON cb.doc_id = p.id_b
        |  LEFT JOIN bg rb ON rb.doc_id = p.id_a AND rb.bg = cb.bg
        |  GROUP BY p.id_a, p.id_b)
        |SELECT p.id_a, p.id_b, tr.n AS ref_toks, tc.n AS cand_toks,
        |  p1.p1_num, COALESCE(p2.p2_num, 0) AS p2_num,
        |  tb.n AS p2_den,
        |  CASE WHEN p1.p1_num = 0 OR COALESCE(p2.p2_num, 0) = 0
        |      OR tb.n = 0 THEN 0.0
        |  ELSE round(least(1.0, exp(1.0
        |      - CAST(tr.n AS DOUBLE) / CAST(tc.n AS DOUBLE)))
        |    * exp(0.5
        |      * (ln(CAST(p1.p1_num AS DOUBLE) / CAST(tc.n AS DOUBLE))
        |       + ln(CAST(COALESCE(p2.p2_num, 0) AS DOUBLE)
        |           / CAST(tb.n AS DOUBLE)))), 6) END AS bleu_r6
        |FROM pairs p
        |JOIN tot_u tr ON tr.doc_id = p.id_a
        |JOIN tot_u tc ON tc.doc_id = p.id_b
        |JOIN tot_b tb ON tb.doc_id = p.id_b
        |JOIN p1 ON p1.id_a = p.id_a AND p1.id_b = p.id_b
        |LEFT JOIN p2 ON p2.id_a = p.id_a AND p2.id_b = p.id_b
        |ORDER BY p.id_a, p.id_b""").stripMargin,
  )
}
