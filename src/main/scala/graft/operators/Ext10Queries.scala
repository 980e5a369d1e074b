package graft.operators

import graft.Tables.t
import graft.operators.TextAnalysis.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 batch 3: the model-driven curation stages of a training-data
  * pipeline — a hashed linear quality classifier (the fastText-style
  * model-based filter, vs the heuristic `text_quality`), DSIR
  * importance-resampling data selection (hashed-bigram log-likelihood
  * ratios between a target and the raw corpus), and an interpolated
  * Kneser-Ney bigram LM table (the smoothing actually used by n-gram
  * LMs, vs the raw MLE of `text_bigram_nll`).
  *
  * All three keep the cross-engine exactness contract used throughout:
  * md5-derived feature hashes, log() quantized once to integer
  * micro-nats (the `text_unigram_nll` pattern), and all sums/divisions
  * in integer arithmetic.
  */
object Ext10Queries {

  /** 60-bit positive integer from md5 of `prefix || col` — the repo's
    * engine-portable hash (DuckDB: CAST('0x'||substr(md5(..),1,15) AS
    * BIGINT)).
    */
  private def h60(prefix: String, c: Column): Column =
    conv(substring(md5(concat(lit(prefix), c)), 1, 15), 16, 10)
      .cast("long")

  /** Per-(doc, token) occurrence counts — the skew-safe pre-aggregate
    * (hot stopword keys carry one row per doc, not one per occurrence)
    * shared by the classifier and DSIR below.
    */
  private def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(transform(tokens(col("text")), t => lower(t))).as("tok"))
      .groupBy("doc_id", "lang", "tok")
      .agg(count(lit(1)).as("n_occ"))

  /** Hashed-feature linear quality classifier (fastText-ish): each
    * token hashes to a weight in integer micro-units, the document
    * score is the occurrence-weighted sum, keep = score >= 0.
    *
    * The weight here is a pure function of the feature hash (md5 →
    * [-1000, 1000] micro-units) — a deterministic stand-in for a
    * trained weight vector, exactly like the multimodal codec stub:
    * the distributed plumbing (feature hashing, per-doc partial
    * aggregation, bias-free dot product) is the real operator; a
    * production model swaps the hash-weight expression for a
    * broadcast vocab→weight array lookup with the identical plan.
    *
    * 100 TB shape: explode → per-(doc,tok) partial agg → per-doc agg.
    * No join anywhere — the weight is computed, not looked up — so the
    * only shuffle is the per-doc aggregation, linear in corpus size.
    */
  def qualityModel(spark: SparkSession, dir: String): DataFrame = {
    docTokens(t(spark, dir, "documents"))
      .withColumn("w_micro",
        pmod(h60("qw:", col("tok")), lit(2001L)) - 1000L)
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_tokens"),
        sum(col("w_micro") * col("n_occ")).as("score_micro"))
      .withColumn("keep", col("score_micro") >= 0)
      .orderBy("doc_id")
  }

  private val DsirBuckets = 4096L // hashed-bigram feature space
  private val DsirTopK = 100      // selected corpus size

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * estimate target and raw unigram-pair (bigram) distributions in a
    * hashed feature space, score every raw document by its summed
    * log-likelihood ratio, and keep the top slice.
    *
    * Target here = the `lang = 'en'` subcorpus (the "high quality
    * proxy" role); raw = everything. Per-bucket ratio uses add-1
    * smoothing over the 4096 buckets, quantized once to micro-nats:
    *   lam[b] = round(1e6 * ln( (ct[b]+1)(Tr+B) / ((cr[b]+1)(Tt+B)) ))
    * so the per-doc sum is exact integer math. The long products in
    * the ratio stay < 2^62 up to ~1e9 bigram occurrences per side;
    * beyond that they upgrade to decimal(38,0) without changing the
    * quantization point.
    *
    * 100 TB shape: bucket counts are two hash aggregates that COLLAPSE
    * to <= 4096 rows each (partial aggregation does the heavy lifting
    * map-side); the lambda table is broadcast back onto the per-(doc,
    * bigram) rows; the final top-k is a TakeOrdered, not a global
    * sort. Document scoring is one linear pass + one bounded
    * broadcast join.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tk = transform(tokens(col("text")), x => lower(x))
    val docBi = docs
      .select(col("doc_id"), col("lang"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"), explode(transform(
        sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b.w1"), col("b.w2"))
      .agg(count(lit(1)).as("n_occ"))
      .withColumn("bucket", pmod(
        h60("dsir:", concat(col("w1"), lit(" "), col("w2"))),
        lit(DsirBuckets)))
      // referenced three times (raw counts, target counts, scoring):
      // plan-keyed cache() so the tokenize+pair explode runs once per
      // materialization, not three times (CacheManager dedups repeated
      // constructions; bench clearCache releases between queries)
      .cache()
    val rawC = docBi.groupBy("bucket").agg(sum("n_occ").as("cr"))
    val tgtC = docBi.filter(col("lang") === "en")
      .groupBy("bucket").agg(sum("n_occ").as("ct"))
    val tot = rawC.agg(sum("cr").as("tr")).crossJoin(
      tgtC.agg(sum("ct").as("tt")))
    val lam = rawC
      .join(tgtC, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tot))
      .withColumn("lam_micro", round(log(
        ((col("ct") + 1L) * (col("tr") + DsirBuckets)).cast("double") /
          ((col("cr") + 1L) * (col("tt") + DsirBuckets)).cast("double"))
        * 1e6).cast("long"))
      .select("bucket", "lam_micro")
    docBi.join(broadcast(lam), "bucket")
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_bigrams"),
        sum(col("lam_micro") * col("n_occ")).as("w_micro"))
      .orderBy(col("w_micro").desc, col("doc_id"))
      .limit(DsirTopK)
  }

  private val KnTopK = 50

  /** Interpolated Kneser-Ney bigram probabilities with discount
    * D = 3/4 — the LM-training artifact itself (the smoothed
    * conditional table), exact on an integer lattice because D is
    * rational:
    *
    *   P(w2|w1) = (c12 - 3/4)/c1 + (3/4 · N1+(w1·)/c1) · N1+(·w2)/NB
    *            = [ (4·c12 - 3)·NB + 3·N1+(w1·)·N1+(·w2) ] / (4·c1·NB)
    *
    * (c12 >= 1 for every emitted bigram, so the max(·,0) discount
    * clamp never binds and the closed form is exact.) p_micro floors
    * that rational onto the 1e-6 lattice with integer division —
    * numerator magnitudes stay < 4e17 up to ~1e6 distinct bigrams
    * and c12 ~ 1e5, inside long range at every test SF.
    *
    * 100 TB shape: three hash aggregates over the bigram vocabulary
    * (sublinear in the corpus — the corpus itself is touched once by
    * the (w1,w2) count), one 1-row broadcast for NB, and a TakeOrdered
    * top-k. The continuation-count join keys on w2 (vocabulary-sized).
    */
  def knBigram(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tk = transform(tokens(col("text")), x => lower(x))
    val lm12 = docs
      .select(tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(explode(transform(
        sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("b"))
      .groupBy(col("b.w1"), col("b.w2"))
      .agg(count(lit(1)).as("c12"))
      // referenced four times (lm1, cont, nb, the final join): plan-
      // keyed cache() so the corpus tokenize+pair aggregate runs once
      .cache()
    val lm1 = lm12.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1_fwd"))
    val cont = lm12.groupBy("w2").agg(count(lit(1)).as("n1_bwd"))
    val nb = lm12.agg(count(lit(1)).as("nb"))
    lm12.join(lm1, "w1").join(cont, "w2").crossJoin(broadcast(nb))
      .withColumn("p_micro", expr(
        """(((4 * c12 - 3) * nb + 3 * n1_fwd * n1_bwd) * 1000000)
           div (4 * c1 * nb)"""))
      .select("w1", "w2", "c12", "p_micro")
      .orderBy(col("p_micro").desc, col("w1"), col("w2"))
      .limit(KnTopK)
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * (every 50th vector), the top-5 most-similar vectors with a
    * DIFFERENT label — the near-misses a contrastive loss learns the
    * most from. Same plan contract as `sim_cosine_topk`: the small
    * anchor set broadcasts against the corpus (norms computed once per
    * row BEFORE the pair join, codegen'd in-order FloatVecDot — no
    * corpus shuffle), per-anchor top-k via one bounded window. The
    * 100 TB variant swaps the corpus scan for the LSH/IVF-pruned
    * candidate set exactly as `sim_ann_*` do; the mining logic —
    * cross-label filter + per-anchor rank — is unchanged.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
      .filter(col("embedding").isNotNull)
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_vec"))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
    val c = emb
      .select(col("vec_id").as("n_id"), col("label").as("n_label"),
        col("embedding").as("n_vec"))
      .withColumn("n_nrm", Similarity.norm(col("n_vec")))
    val sim = c.join(broadcast(q), col("n_label") =!= col("q_label"))
      .withColumn("sim", round(
        Similarity.dot(col("q_vec"), col("n_vec"))
          / (col("q_nrm") * col("n_nrm")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("q_id", "q_label", "n_id", "n_label", "sim", "rank")
      .orderBy("q_id", "rank")
  }

  /** Composed curation pipeline over the round's model-driven stages:
    * classifier gate (score >= 0) -> DSIR importance rank on the
    * SURVIVORS -> per-language diversity cap (top 10 per lang by
    * weight) — the shape of a production data-mix build where each
    * stage's pruning feeds the next. One corpus pass per stage, all
    * intermediate keys bounded; the final per-lang rank is a window
    * over <= |langs| * corpus-survivors rows, partitioned on lang.
    */
  def curatePipeline(spark: SparkSession, dir: String): DataFrame = {
    val kept = docTokens(t(spark, dir, "documents"))
      .withColumn("w_micro",
        pmod(h60("qw:", col("tok")), lit(2001L)) - 1000L)
      .groupBy("doc_id")
      .agg(sum(col("w_micro") * col("n_occ")).as("score_micro"))
      .filter(col("score_micro") >= 0)
      .select("doc_id")
    val docs = t(spark, dir, "documents")
      .join(kept, Seq("doc_id"), "left_semi")
    val tk = transform(tokens(col("text")), x => lower(x))
    val docBi = docs
      .select(col("doc_id"), col("lang"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("lang"), explode(transform(
        sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("b"))
      .groupBy(col("doc_id"), col("lang"), col("b.w1"), col("b.w2"))
      .agg(count(lit(1)).as("n_occ"))
      .withColumn("bucket", pmod(
        h60("dsir:", concat(col("w1"), lit(" "), col("w2"))),
        lit(DsirBuckets)))
      .cache()
    val rawC = docBi.groupBy("bucket").agg(sum("n_occ").as("cr"))
    val tgtC = docBi.filter(col("lang") === "en")
      .groupBy("bucket").agg(sum("n_occ").as("ct"))
    val tot = rawC.agg(sum("cr").as("tr")).crossJoin(
      tgtC.agg(sum("ct").as("tt")))
    val lam = rawC
      .join(tgtC, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tot))
      .withColumn("lam_micro", round(log(
        ((col("ct") + 1L) * (col("tr") + DsirBuckets)).cast("double") /
          ((col("cr") + 1L) * (col("tt") + DsirBuckets)).cast("double"))
        * 1e6).cast("long"))
      .select("bucket", "lam_micro")
    val weighted = docBi.join(broadcast(lam), "bucket")
      .groupBy("doc_id", "lang")
      .agg(sum(col("lam_micro") * col("n_occ")).as("w_micro"))
    val wLang = org.apache.spark.sql.expressions.Window
      .partitionBy("lang")
      .orderBy(col("w_micro").desc, col("doc_id"))
    weighted.withColumn("lang_rank", row_number().over(wLang))
      .filter(col("lang_rank") <= 10)
      .select("doc_id", "lang", "w_micro", "lang_rank")
      .orderBy("lang", "lang_rank")
  }

  /** Classifier-evaluation confusion matrix: the n-gram language-ID
    * heuristic scored against the declared `lang` label, with
    * row-normalized shares on the 1e-6 lattice. The eval shape every
    * model-driven curation stage needs before its filter goes live —
    * per-(truth, prediction) counts collapse to a |langs|^2 table
    * map-side; the share window runs on that bounded table.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cm = TextAnalysis
      .langId(t(spark, dir, "documents"), "text")
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    cm.withColumn("lang_total", sum(col("n")).over(w))
      .withColumn("share_micro", expr("(n * 1000000) div lang_total"))
      .select("lang", "lang_guess", "n", "share_micro")
      .orderBy("lang", "lang_guess")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_lang_confusion" -> langConfusion _,
    "text_quality_model" -> qualityModel _,
    "text_dsir_select" -> dsirSelect _,
    "text_kn_bigram" -> knBigram _,
    "sim_hard_negatives" -> hardNegatives _,
    "pipeline_curate2" -> curatePipeline _,
  )

  def oracle: Map[String, String] = Map(
    "text_quality_model" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    lower(unnest(string_split_regex(trim(text), '\s+'))) AS tok
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, tok, COUNT(*) AS n_occ FROM tk
        |  GROUP BY doc_id, tok
        |), ws AS (
        |  SELECT doc_id, n_occ,
        |    CAST(('0x' || substr(md5('qw:' || tok), 1, 15)) AS BIGINT)
        |      % 2001 - 1000 AS w_micro
        |  FROM dt)
        |SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_tokens,
        |  CAST(SUM(w_micro * n_occ) AS BIGINT) AS score_micro,
        |  SUM(w_micro * n_occ) >= 0 AS keep
        |FROM ws GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "text_dsir_select" ->
      s"""WITH tk AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(lower(trim(text)), '\\s+') AS tk
        |  FROM documents
        |), bi AS (
        |  SELECT doc_id, lang, tk[CAST(i AS INT)] AS w1,
        |    tk[CAST(i AS INT) + 1] AS w2
        |  FROM tk, UNNEST(range(1, len(tk))) AS r(i)
        |  WHERE len(tk) >= 2
        |), db AS (
        |  SELECT doc_id, lang, w1, w2, COUNT(*) AS n_occ,
        |    CAST(('0x' || substr(md5('dsir:' || w1 || ' ' || w2), 1, 15))
        |      AS BIGINT) % $DsirBuckets AS bucket
        |  FROM bi GROUP BY doc_id, lang, w1, w2
        |), rawc AS (
        |  SELECT bucket, CAST(SUM(n_occ) AS BIGINT) AS cr FROM db
        |  GROUP BY bucket
        |), tgtc AS (
        |  SELECT bucket, CAST(SUM(n_occ) AS BIGINT) AS ct FROM db
        |  WHERE lang = 'en' GROUP BY bucket
        |), tot AS (
        |  SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM rawc) AS tr,
        |    (SELECT CAST(SUM(ct) AS BIGINT) FROM tgtc) AS tt
        |), lam AS (
        |  SELECT rawc.bucket,
        |    CAST(ROUND(LN(CAST((COALESCE(ct, 0) + 1) * (tr + $DsirBuckets)
        |        AS DOUBLE) /
        |      CAST((cr + 1) * (tt + $DsirBuckets) AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS lam_micro
        |  FROM rawc LEFT JOIN tgtc ON rawc.bucket = tgtc.bucket
        |  CROSS JOIN tot)
        |SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(lam_micro * n_occ) AS BIGINT) AS w_micro
        |FROM db JOIN lam ON db.bucket = lam.bucket
        |GROUP BY doc_id
        |ORDER BY w_micro DESC, doc_id LIMIT $DsirTopK""".stripMargin,
    "text_kn_bigram" ->
      s"""WITH tk AS (
        |  SELECT string_split_regex(lower(trim(text)), '\\s+') AS tk
        |  FROM documents
        |), bi AS (
        |  SELECT tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
        |  FROM tk, UNNEST(range(1, len(tk))) AS r(i)
        |  WHERE len(tk) >= 2
        |), lm12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2
        |), lm1 AS (
        |  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
        |    COUNT(*) AS n1_fwd
        |  FROM lm12 GROUP BY w1
        |), cont AS (
        |  SELECT w2, COUNT(*) AS n1_bwd FROM lm12 GROUP BY w2
        |), nbt AS (
        |  SELECT COUNT(*) AS nb FROM lm12)
        |SELECT lm12.w1, lm12.w2, c12,
        |  CAST((((4 * c12 - 3) * nb + 3 * n1_fwd * n1_bwd) * 1000000)
        |    // (4 * c1 * nb) AS BIGINT) AS p_micro
        |FROM lm12 JOIN lm1 ON lm12.w1 = lm1.w1
        |JOIN cont ON lm12.w2 = cont.w2 CROSS JOIN nbt
        |ORDER BY p_micro DESC, lm12.w1, lm12.w2 LIMIT $KnTopK""".stripMargin,
    "text_lang_confusion" ->
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
        |  GROUP BY lang, lang_guess)
        |SELECT lang, lang_guess, CAST(n AS BIGINT) AS n,
        |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY lang)
        |    AS BIGINT) AS share_micro
        |FROM cm ORDER BY lang, lang_guess""".stripMargin,
    "pipeline_curate2" ->
      s"""WITH tk0 AS (
        |  SELECT doc_id,
        |    lower(unnest(string_split_regex(trim(text), '\\s+'))) AS tok
        |  FROM documents
        |), dt AS (
        |  SELECT doc_id, tok, COUNT(*) AS n_occ FROM tk0
        |  GROUP BY doc_id, tok
        |), keep AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id,
        |      SUM((CAST(('0x' || substr(md5('qw:' || tok), 1, 15))
        |        AS BIGINT) % 2001 - 1000) * n_occ) AS score
        |    FROM dt GROUP BY doc_id)
        |  WHERE score >= 0
        |), d AS (
        |  SELECT documents.doc_id, lang, text FROM documents
        |  JOIN keep ON documents.doc_id = keep.doc_id
        |), tk AS (
        |  SELECT doc_id, lang,
        |    string_split_regex(lower(trim(text)), '\\s+') AS tk
        |  FROM d
        |), bi AS (
        |  SELECT doc_id, lang, tk[CAST(i AS INT)] AS w1,
        |    tk[CAST(i AS INT) + 1] AS w2
        |  FROM tk, UNNEST(range(1, len(tk))) AS r(i)
        |  WHERE len(tk) >= 2
        |), db AS (
        |  SELECT doc_id, lang, w1, w2, COUNT(*) AS n_occ,
        |    CAST(('0x' || substr(md5('dsir:' || w1 || ' ' || w2), 1, 15))
        |      AS BIGINT) % $DsirBuckets AS bucket
        |  FROM bi GROUP BY doc_id, lang, w1, w2
        |), rawc AS (
        |  SELECT bucket, CAST(SUM(n_occ) AS BIGINT) AS cr FROM db
        |  GROUP BY bucket
        |), tgtc AS (
        |  SELECT bucket, CAST(SUM(n_occ) AS BIGINT) AS ct FROM db
        |  WHERE lang = 'en' GROUP BY bucket
        |), tot AS (
        |  SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM rawc) AS tr,
        |    (SELECT CAST(SUM(ct) AS BIGINT) FROM tgtc) AS tt
        |), lam AS (
        |  SELECT rawc.bucket,
        |    CAST(ROUND(LN(CAST((COALESCE(ct, 0) + 1) * (tr + $DsirBuckets)
        |        AS DOUBLE) /
        |      CAST((cr + 1) * (tt + $DsirBuckets) AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS lam_micro
        |  FROM rawc LEFT JOIN tgtc ON rawc.bucket = tgtc.bucket
        |  CROSS JOIN tot
        |), wts AS (
        |  SELECT doc_id, lang,
        |    CAST(SUM(lam_micro * n_occ) AS BIGINT) AS w_micro
        |  FROM db JOIN lam ON db.bucket = lam.bucket
        |  GROUP BY doc_id, lang
        |), rk AS (
        |  SELECT doc_id, lang, w_micro,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY w_micro DESC, doc_id) AS INT) AS lang_rank
        |  FROM wts)
        |SELECT doc_id, lang, w_micro, lang_rank FROM rk
        |WHERE lang_rank <= 10 ORDER BY lang, lang_rank""".stripMargin,
    "sim_hard_negatives" ->
      """WITH qe AS (
        |  SELECT vec_id AS q_id, label AS q_label,
        |    generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL AND vec_id % 50 = 0
        |), ee AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE embedding IS NOT NULL
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT qe.q_id, qe.q_label, ee.vec_id AS n_id,
        |    ee.label AS n_label, SUM(qe.x * ee.x) AS dot
        |  FROM qe JOIN ee ON qe.i = ee.i AND qe.q_label <> ee.label
        |  GROUP BY qe.q_id, qe.q_label, ee.vec_id, ee.label
        |), sims AS (
        |  SELECT d.q_id, d.q_label, d.n_id, d.n_label,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), ranked AS (
        |  SELECT q_id, q_label, n_id, n_label, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, n_id) AS rank
        |  FROM sims)
        |SELECT q_id, q_label, n_id, n_label, sim,
        |  CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
  )
}
