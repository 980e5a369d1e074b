package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 batch 4: evaluation + time-series + mixing operators — the
  * measurement stages a curation pipeline runs BEFORE trusting its
  * model-driven filters (reference analog: the monitoring surface,
  * App.java:41-44, generalized from pipeline health to model health).
  *
  *  - `eval_langid_prf` / `eval_cohen_kappa`: per-class precision/
  *    recall/F1 and chance-corrected agreement for the language-ID
  *    classifier against the declared label — the go/no-go check for
  *    any model-based filter (fastText-style) before it gates data.
  *  - `eval_ann_recall`: recall@k of the SRP-LSH ANN path against the
  *    brute-force ground truth — THE standard ANN quality metric; run
  *    on a small query sample by construction (ground truth is exact
  *    top-k, which is only computable on a sample at 100 TB).
  *  - `ts_ewma`: exponentially-weighted moving average with dyadic
  *    weights (alpha = 1/2) over a bounded 8-lag window — integer-
  *    exact (value on the 1e-3 lattice, weights are powers of two, one
  *    integer division at the end), so cross-engine parity is by
  *    construction rather than FP luck.
  *  - `text_mix_temperature`: temperature-scaled source mixture
  *    weights (T = 2, i.e. w_s ∝ sqrt(p_s)) — the standard
  *    multilingual/multi-source rebalancing rule; sqrt is quantized to
  *    the 1e-6 lattice BEFORE the normalizing sum so the division is
  *    integer-exact.
  *
  * All aggregates collapse map-side to bounded tables (|classes|^2,
  * |sources|, |queries|·k); no operator here shuffles the corpus more
  * than once.
  */
object Ext11Queries {

  /** Truth/prediction marginals of the language-ID confusion matrix:
    * one row per class with row total (n_true), column total (n_pred)
    * and diagonal (tp). Bounded: |classes| rows.
    */
  private def langMarginals(spark: SparkSession, dir: String): DataFrame = {
    val cm = TextAnalysis.langId(t(spark, dir, "documents"), "text")
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
    val rowt = cm.groupBy(col("lang").as("cls")).agg(sum("n").as("rn"))
    val colt = cm.groupBy(col("lang_guess").as("cls"))
      .agg(sum("n").as("cn"))
    val diag = cm.filter(col("lang") === col("lang_guess"))
      .select(col("lang").as("cls"), col("n").as("dn"))
    rowt.join(colt, Seq("cls"), "full_outer")
      .join(diag, Seq("cls"), "left")
      .na.fill(0L, Seq("rn", "cn", "dn"))
  }

  /** Per-class precision / recall / F1 on the 1e-6 integer lattice.
    * Classes with no truth (or no prediction) mass yield NULL for the
    * undefined metric instead of a fake 0 — the honest eval contract.
    */
  def langidPrf(spark: SparkSession, dir: String): DataFrame =
    langMarginals(spark, dir)
      .select(col("cls"), col("rn").as("n_true"), col("cn").as("n_pred"),
        col("dn").as("tp"),
        when(col("cn") > 0, expr("(dn * 1000000) div cn"))
          .as("prec_micro"),
        when(col("rn") > 0, expr("(dn * 1000000) div rn"))
          .as("rec_micro"),
        when(col("rn") + col("cn") > 0,
          expr("(2 * dn * 1000000) div (rn + cn)")).as("f1_micro"))
      .orderBy("cls")

  /** Cohen's kappa = (po - pe) / (1 - pe), computed entirely in integer
    * arithmetic: with N = total, A = agreements, E = sum of
    * rowTotal*colTotal per class, kappa = (A*N - E) / (N^2 - E). Both
    * engines truncate integral division toward zero, so the lattice
    * value is engine-exact even if agreement dips below chance.
    */
  def cohenKappa(spark: SparkSession, dir: String): DataFrame =
    langMarginals(spark, dir)
      .agg(sum("rn").as("n_total"), sum("dn").as("n_agree"),
        sum(col("rn") * col("cn")).as("pe_num"))
      .select(col("n_total"), col("n_agree"),
        expr("(n_agree * 1000000) div n_total").as("po_micro"),
        expr("(pe_num * 1000000) div (n_total * n_total)")
          .as("pe_micro"),
        expr("((n_agree * n_total - pe_num) * 1000000)" +
          " div (n_total * n_total - pe_num)").as("kappa_micro"))

  /** Recall@10 of the SRP-LSH ANN path vs brute-force cosine ground
    * truth, per query vector. The ANN candidate set is bucket-pruned
    * (never all-pairs); ground truth is the broadcast brute-force pass
    * — correct HERE because the query set is 8 vectors, and that
    * sampling IS the 100 TB design (exact top-k over the full corpus
    * is only affordable for an eval sample).
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val qs = emb.filter(col("vec_id") < 8)
    val truth = Similarity
      .cosineTopK(emb, qs, "vec_id", "embedding", k = 10)
      .select("q_id", "n_id")
    val ann = Similarity
      .lshTopK(emb, qs, "vec_id", "embedding", k = 10, planes = 6,
        dims = 64)
      .select("q_id", "n_id")
    val tn = truth.groupBy("q_id").agg(count(lit(1)).as("n_true"))
    val an = ann.groupBy("q_id").agg(count(lit(1)).as("n_ann"))
    val hits = ann.join(truth, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    tn.join(an, Seq("q_id"), "left").join(hits, Seq("q_id"), "left")
      .na.fill(0L, Seq("n_ann", "n_hit"))
      .withColumn("recall_micro", expr("(n_hit * 1000000) div n_true"))
      .orderBy("q_id")
  }

  /** Dyadic-weight EWMA (alpha = 1/2) over up to 8 lags per user,
    * ordered by event_id: weights 128,64,...,1 over (current..lag 7),
    * renormalized over the lags that exist. value is quantized to the
    * 1e-3 lattice first (the ev_anomaly_zscore convention), so num and
    * den are exact longs and the result is one integral division.
    * Plan: a single window pass (all 8 lags share one window spec).
    */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val v = t(spark, dir, "events").select(col("user_id"),
      col("event_id"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
    val lags: Seq[Column] = (1 to 7).map(j => lag(col("vm"), j).over(w))
    val num = lags.zipWithIndex.foldLeft(col("vm") * 128L) {
      case (acc, (l, i)) =>
        acc + coalesce(l, lit(0L)) * (1L << (6 - i))
    }
    val den = lags.zipWithIndex.foldLeft(lit(128L)) {
      case (acc, (l, i)) =>
        acc + when(l.isNotNull, lit(1L << (6 - i))).otherwise(lit(0L))
    }
    v.withColumn("num", num).withColumn("den", den)
      .select(col("user_id"), col("event_id"), col("vm"),
        expr("(num * 1000000) div den").as("ewma_micro"))
      .orderBy("user_id", "event_id")
  }

  /** Temperature-scaled source mixture (T = 2): w_s ∝ sqrt(n_s / N),
    * the standard rule that upweights small sources without letting
    * them dominate. sqrt values are quantized to the 1e-6 lattice
    * BEFORE the normalizing sum — the sum is then integer (order-free
    * across engines) and the final weight one integral division.
    * Whole-set windows over the |sources|-row table, no cross join.
    */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val all = Window.partitionBy()
    t(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("n_total", sum("n_docs").over(all))
      .withColumn("p_micro", expr("(n_docs * 1000000) div n_total"))
      .withColumn("s_micro",
        round(sqrt(col("n_docs").cast("double") / col("n_total"))
          * 1e6).cast("long"))
      .withColumn("t_total", sum("s_micro").over(all))
      .withColumn("w_micro", expr("(s_micro * 1000000) div t_total"))
      .select("source", "n_docs", "p_micro", "s_micro", "w_micro")
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "eval_langid_prf" -> langidPrf _,
    "eval_cohen_kappa" -> cohenKappa _,
    "eval_ann_recall" -> annRecall _,
    "ts_ewma" -> ewma _,
    "text_mix_temperature" -> mixTemperature _,
  )

  /** Shared confusion-matrix marginal CTE prefix (mirrors
    * text_lang_confusion's tokenization exactly).
    */
  private val marginalsCte: String =
    """WITH base AS (
      |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents
      |), m AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(tk, x -> list_contains(
      |      ['the', 'a', 'of', 'and', 'in', 'to', 'is'], lower(x))))
      |      AS en_hits,
      |    len(list_filter(tk, x -> list_contains(
      |      ['el', 'la', 'de', 'que', 'y', 'en', 'es'], lower(x))))
      |      AS es_hits
      |  FROM base
      |), g AS (
      |  SELECT lang,
      |    CASE WHEN en_hits > es_hits AND en_hits > 0 THEN 'en'
      |         WHEN es_hits > en_hits AND es_hits > 0 THEN 'es'
      |         ELSE 'unk' END AS lang_guess
      |  FROM m
      |), cm AS (
      |  SELECT lang, lang_guess, COUNT(*) AS n FROM g
      |  GROUP BY lang, lang_guess
      |), rt AS (
      |  SELECT lang AS cls, CAST(SUM(n) AS BIGINT) AS rn FROM cm
      |  GROUP BY lang
      |), ct AS (
      |  SELECT lang_guess AS cls, CAST(SUM(n) AS BIGINT) AS cn FROM cm
      |  GROUP BY lang_guess
      |), dg AS (
      |  SELECT lang AS cls, CAST(n AS BIGINT) AS dn FROM cm
      |  WHERE lang = lang_guess
      |), j AS (
      |  SELECT COALESCE(rt.cls, ct.cls) AS cls, COALESCE(rn, 0) AS rn,
      |    COALESCE(cn, 0) AS cn, COALESCE(dn, 0) AS dn
      |  FROM rt FULL OUTER JOIN ct ON ct.cls = rt.cls
      |  LEFT JOIN dg ON dg.cls = COALESCE(rt.cls, ct.cls))
      |""".stripMargin

  /** Shared embedding CTE prefix for the recall oracle: brute-force
    * truth and LSH candidates over the same rounded-sim lattice
    * (mirrors the sim_cosine_topk / sim_ann_lsh oracles at k = 10).
    */
  private val annRecallSql: String =
    """WITH ee AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
      |), dots AS (
      |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
      |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
      |  WHERE q.vec_id < 8
      |  GROUP BY q.vec_id, e.vec_id
      |), sims AS (
      |  SELECT d.q_id, d.n_id,
      |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
      |  FROM dots d
      |  JOIN norms nq ON nq.vec_id = d.q_id
      |  JOIN norms ne ON ne.vec_id = d.n_id
      |), truth AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY sim DESC, n_id) AS rank
      |    FROM sims) WHERE rank <= 10
      |), contrib AS (
      |  SELECT vec_id, p,
      |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
      |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
      |      AS c
      |  FROM ee, UNNEST(range(0, 6)) AS pl(p)
      |  GROUP BY vec_id, p
      |), buckets AS (
      |  SELECT vec_id,
      |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
      |      ORDER BY p) AS bucket
      |  FROM contrib GROUP BY vec_id
      |), ann AS (
      |  SELECT q_id, n_id FROM (
      |    SELECT s.q_id, s.n_id, ROW_NUMBER() OVER (PARTITION BY s.q_id
      |      ORDER BY s.sim DESC, s.n_id) AS rank
      |    FROM sims s
      |    JOIN buckets bq ON bq.vec_id = s.q_id
      |    JOIN buckets be ON be.vec_id = s.n_id
      |      AND be.bucket = bq.bucket) WHERE rank <= 10
      |), tn AS (
      |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_true FROM truth
      |  GROUP BY q_id
      |), an AS (
      |  SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_ann FROM ann
      |  GROUP BY q_id
      |), h AS (
      |  SELECT a.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit
      |  FROM ann a JOIN truth t ON t.q_id = a.q_id AND t.n_id = a.n_id
      |  GROUP BY a.q_id)
      |SELECT tn.q_id, tn.n_true, COALESCE(an.n_ann, 0) AS n_ann,
      |  COALESCE(h.n_hit, 0) AS n_hit,
      |  CAST((COALESCE(h.n_hit, 0) * 1000000) // tn.n_true AS BIGINT)
      |    AS recall_micro
      |FROM tn
      |LEFT JOIN an ON an.q_id = tn.q_id
      |LEFT JOIN h ON h.q_id = tn.q_id
      |ORDER BY tn.q_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "eval_langid_prf" -> (marginalsCte +
      """SELECT cls, rn AS n_true, cn AS n_pred, dn AS tp,
        |  CASE WHEN cn > 0 THEN (dn * 1000000) // cn END AS prec_micro,
        |  CASE WHEN rn > 0 THEN (dn * 1000000) // rn END AS rec_micro,
        |  CASE WHEN rn + cn > 0 THEN (2 * dn * 1000000) // (rn + cn)
        |    END AS f1_micro
        |FROM j ORDER BY cls""".stripMargin),
    "eval_cohen_kappa" -> (marginalsCte +
      """, s AS (
        |  SELECT CAST(SUM(rn) AS BIGINT) AS n_total,
        |    CAST(SUM(dn) AS BIGINT) AS n_agree,
        |    CAST(SUM(rn * cn) AS BIGINT) AS pe_num
        |  FROM j)
        |SELECT n_total, n_agree,
        |  (n_agree * 1000000) // n_total AS po_micro,
        |  (pe_num * 1000000) // (n_total * n_total) AS pe_micro,
        |  ((n_agree * n_total - pe_num) * 1000000)
        |    // (n_total * n_total - pe_num) AS kappa_micro
        |FROM s""".stripMargin),
    "eval_ann_recall" -> annRecallSql,
    "ts_ewma" ->
      """WITH v AS (
        |  SELECT user_id, event_id,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), l AS (
        |  SELECT user_id, event_id, vm,
        |    lag(vm, 1) OVER win AS l1, lag(vm, 2) OVER win AS l2,
        |    lag(vm, 3) OVER win AS l3, lag(vm, 4) OVER win AS l4,
        |    lag(vm, 5) OVER win AS l5, lag(vm, 6) OVER win AS l6,
        |    lag(vm, 7) OVER win AS l7
        |  FROM v
        |  WINDOW win AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, event_id, vm,
        |  ((vm * 128 + COALESCE(l1, 0) * 64 + COALESCE(l2, 0) * 32
        |    + COALESCE(l3, 0) * 16 + COALESCE(l4, 0) * 8
        |    + COALESCE(l5, 0) * 4 + COALESCE(l6, 0) * 2
        |    + COALESCE(l7, 0)) * 1000000)
        |  // (128 + CASE WHEN l1 IS NULL THEN 0 ELSE 64 END
        |    + CASE WHEN l2 IS NULL THEN 0 ELSE 32 END
        |    + CASE WHEN l3 IS NULL THEN 0 ELSE 16 END
        |    + CASE WHEN l4 IS NULL THEN 0 ELSE 8 END
        |    + CASE WHEN l5 IS NULL THEN 0 ELSE 4 END
        |    + CASE WHEN l6 IS NULL THEN 0 ELSE 2 END
        |    + CASE WHEN l7 IS NULL THEN 0 ELSE 1 END) AS ewma_micro
        |FROM l ORDER BY user_id, event_id""".stripMargin,
    "text_mix_temperature" ->
      """WITH s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, n_docs,
        |    CAST(SUM(n_docs) OVER () AS BIGINT) AS n_total
        |  FROM s
        |), q AS (
        |  SELECT source, n_docs,
        |    (n_docs * 1000000) // n_total AS p_micro,
        |    CAST(round(sqrt(CAST(n_docs AS DOUBLE) / n_total) * 1000000)
        |      AS BIGINT) AS s_micro
        |  FROM w)
        |SELECT source, n_docs, p_micro, s_micro,
        |  CAST((s_micro * 1000000) // CAST(SUM(s_micro) OVER () AS BIGINT)
        |    AS BIGINT) AS w_micro
        |FROM q ORDER BY source""".stripMargin,
  )
}
