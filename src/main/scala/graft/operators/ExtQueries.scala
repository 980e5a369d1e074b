package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the §7.5 extension operators (dedup, similarity,
  * text analysis, multimodal metadata) with DuckDB oracles. Each query
  * delegates to the operator library so the oracle verifies the library.
  */
object ExtQueries {

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("content_hash")

  def dedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(t(spark, dir, "documents"), "doc_id", "text",
      minJ = 0.1).orderBy("id_a", "id_b")

  /** Near-dup clusters: connected components over the MinHash-LSH
    * verified pair graph (jaccard>=0.1); cluster = canonical (minimum)
    * doc id. Feeds from the LSH path — candidates bounded by band
    * bucket collisions — NOT the all-pairs-sharing-a-shingle Jaccard
    * join, so the pair generation survives 100 TB.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    NearDupGraph.ccLabels(spark, dir)
      .withColumn("is_canonical", col("id") === col("cluster"))
      .orderBy("id")

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(t(spark, dir, "documents"), "text")
      .select("doc_id", "n_tokens", "n_bpeish", "n_chars_calc")
      .orderBy("doc_id")

  /** Per-source contribution cap (data mixing): hash-ranked, first 15
    * docs per source survive.
    */
  def sourceCap(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.sourceCap(t(spark, dir, "documents"), "doc_id",
        "source", "text", cap = 15)
      .select("doc_id", "source", "src_rank", "kept")
      .orderBy("doc_id")

  /** Benchmark decontamination: flag docs sharing any 5-gram with the
    * "eval set" (docs 0-9 stand in for it; they self-flag, the signal
    * is the rest of the corpus).
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.contaminationFlags(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 10), n = 5)
      .orderBy("doc_id")
  }

  /** Corpus-level statistics (SURVEY §7.5 "corpus stats"): one row of
    * document counts, token totals, vocabulary size and the modal
    * token's frequency — two aggregation trees (doc-level and
    * token-level) over one corpus scan each, crossed at one row.
    */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val toks = docs.select(explode(
      transform(TextAnalysis.tokens(col("text")), tk => lower(tk)))
      .as("tok"))
    val tc = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tstats = tc.agg(
      sum(col("c")).cast("long").as("total_tokens"),
      count(lit(1)).cast("long").as("vocab_size"),
      max(col("c")).cast("long").as("top_token_n"))
    val g = docs.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(length(col("text"))).cast("long").as("total_chars"))
    g.crossJoin(tstats)
      .withColumn("avg_doc_tokens",
        col("total_tokens").cast("double") / col("n_docs").cast("double"))
  }

  /** Corpus-wide top-25 bigrams (the n-gram LM building block): one
    * explode + one count shuffle + TakeOrderedAndProject for the
    * global top-k (bounded state, no full sort). Ties broken by gram
    * text so the cut is deterministic.
    */
  def ngramFreq(spark: SparkSession, dir: String): DataFrame = {
    // tokenize into a NAMED column first: element_at(tk, i) inside the
    // bigram lambda must read a materialized array, not re-run the
    // split per element (the CollapseProject re-evaluation trap)
    val tk = col("tk")
    val bigrams = when(size(tk) >= 2,
      transform(sequence(lit(1), (size(tk) - 1).cast("int")),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1))))
      .otherwise(array().cast("array<string>"))
    t(spark, dir, "documents")
      .select(transform(TextAnalysis.tokens(col("text")),
        t => lower(t)).as("tk"))
      .select(explode(bigrams).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(25)
  }

  /** Gopher-style repetition quality signals over `documents`. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetitionStats(t(spark, dir, "documents"), "doc_id",
        "text")
      .orderBy("doc_id")

  def quality(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityScore(t(spark, dir, "documents"), "text")
      .select("doc_id", "len", "n_tokens", "avg_tok_len", "stop_ratio",
        "quality_ok").orderBy("doc_id")

  def langId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(t(spark, dir, "documents"), "text")
      .select("doc_id", "en_hits", "es_hits", "lang_guess")
      .orderBy("doc_id")

  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprints(t(spark, dir, "documents"), "text")
      .select("doc_id", "fp").orderBy("doc_id")

  /** Rolling-hash fingerprint (custom codegen expression). Oracle:
    * DuckDB replays the same base-257 hash over the UTF-8 bytes with a
    * recursive CTE in HUGEINT mod 2^64, then maps to signed BIGINT —
    * bit-exact with the JVM's wraparound arithmetic.
    */
  def rollingFp(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.rollingHash(col("text"))
          .as("rolling_fp"))
      .orderBy("doc_id")

  def simTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
      "embedding", k = 10).orderBy("q_id", "rank")
  }

  def embedNorms(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    emb.select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(Similarity.norm(col("embedding")), 6).as("norm_r"))
      .orderBy("vec_id")
  }

  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    NearDupGraph.lshPairs(spark, dir).orderBy("id_a", "id_b")

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("id")

  /** Banded simhash pair search (pigeonhole-exact for hamming<=3);
    * oracle brute-forces the same fingerprints all-pairs.
    */
  def dedupSimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(t(spark, dir, "documents"), "doc_id", "text",
      maxHamming = 3).orderBy("id_a", "id_b")

  def simAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
      "embedding", k = 5, planes = 6, dims = 64).orderBy("q_id", "rank")
  }

  def simAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
      "embedding", k = 5, nCells = 16, kmeansIters = 2,
      fitSampleMod = 2).orderBy("q_id", "rank")
  }

  def embedNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDups(t(spark, dir, "embeddings"), "vec_id",
      "embedding", minSim = 0.35, planes = 4, dims = 64)
      .orderBy("id_a", "id_b")

  /** Same fit params as sim_ann_ivf, so the quantizer is identical —
    * this query exposes the full-corpus assignment + cluster sizes.
    */
  def embedKmeans(spark: SparkSession, dir: String): DataFrame =
    Similarity.assignClusters(t(spark, dir, "embeddings"), "vec_id",
        "embedding", nCells = 16, kmeansIters = 2, fitSampleMod = 2)
      .orderBy("vec_id")

  /** The scale form: 3 tables × 8 planes (256 buckets each) — see
    * Similarity.embeddingNearDupsMulti.
    */
  def embedNearDupsMulti(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupsMulti(t(spark, dir, "embeddings"),
      "vec_id", "embedding", minSim = 0.3, planes = 8, dims = 64,
      tables = 3)
      .orderBy("id_a", "id_b")

  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashSplit(t(spark, dir, "documents"), "text")
      .select("doc_id", "bucket", "split").orderBy("doc_id")

  /** End-to-end training-data preparation — the composition the
    * operator library exists for: quality filter -> exact dedup ->
    * near-dup canonical selection (LSH + connected components) ->
    * deterministic hash split. Every stage is the same operator the
    * individual queries verify; the oracle chains their CTEs. At
    * 100 TB this is four narrow/key-shuffle stages over a shrinking
    * survivor set — no stage rescans the full corpus twice.
    */
  def pipelinePrepare(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select("doc_id", "text")
    val qdocs = TextAnalysis.qualityScore(docs, "text")
      .filter(col("quality_ok")).select("doc_id", "text")
    val keep = Dedup.exact(qdocs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    // The survivor set feeds three consumers (LSH pair generation, the
    // canonical join, the final split) — cache it instead of replaying
    // the quality filter + dedup shuffle per consumer (InMemoryRelation
    // keeps size stats, so downstream broadcast decisions survive). On
    // a cluster this would be an intermediate table.
    val edocs = qdocs.join(keep, "doc_id").cache()
    val clusters = Dedup.connectedComponents(
      Dedup.minhashLshPairs(edocs, "doc_id", "text",
        numHashes = 16, bands = 4, minJ = 0.1))
    val canon = edocs.join(
        clusters.select(col("id").as("doc_id"), col("cluster")),
        Seq("doc_id"), "left")
      .filter(col("cluster").isNull || col("cluster") === col("doc_id"))
    TextAnalysis.hashSplit(canon, "text")
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")
  }

  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.attachMedia(t(spark, dir, "documents"), "doc_id", "text")
      .select(col("media_id"), col("media.meta.format").as("format"),
        col("media.meta.n_bytes").as("n_bytes"),
        col("media.meta.checksum").as("checksum"))
      .orderBy("media_id")

  /** Frame sampling over the binary payload (video-frame plan shape:
    * explode to one row per strided fixed-size chunk). Frames are
    * checked by md5 + length; the oracle slices the same bytes.
    */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.attachMedia(t(spark, dir, "documents"), "doc_id",
          "text"), frameBytes = 64, stride = 2)
      .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
        md5(col("frame")).as("frame_md5"),
        octet_length(col("frame")).cast("long").as("frame_len"))
      .orderBy("media_id", "frame_no")

  /** Feature extraction through the partition-batched codec path
    * (`Multimodal.extractFeatures` — the mapPartitions stage a real
    * image/audio decoder drops into). The stub feature is a normalized
    * byte histogram; multiplying back by the payload length recovers
    * EXACT integer counts, so the oracle can replay it from character
    * codes (corpus verified pure-ASCII: byte == code point).
    */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachMedia(docs, "doc_id", "text"), featureDim = 8)
    val lens = docs.select(col("doc_id").as("media_id"),
      octet_length(col("text")).cast("long").as("n"))
    feats.select(col("media_id"),
        posexplode(col("feature")).as(Seq("pos", "v")))
      .join(lens, "media_id")
      .select(col("media_id"), col("pos").cast("long").as("pos"),
        round(col("v") * col("n")).cast("long").as("cnt"))
      .orderBy("media_id", "pos")
  }

  /** Average-pool resize through the batched codec path: 8-dim stub
    * features pooled to 4 (k=2). Pooled values are mapped back to
    * exact integer counts (v·n·k = the sum of the pooled buckets'
    * counts — float error << 0.5, so the round is exact) to keep the
    * oracle integer-precise through the float pipeline.
    */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.attachMedia(docs, "doc_id", "text"), featureDim = 8)
    val small = Multimodal.resizeFeatures(feats, inDim = 8, outDim = 4)
    val lens = docs.select(col("doc_id").as("media_id"),
      octet_length(col("text")).cast("long").as("n"))
    small.select(col("media_id"),
        posexplode(col("feature_small")).as(Seq("pos", "v")))
      .join(lens, "media_id")
      .select(col("media_id"), col("pos").cast("long").as("pos"),
        round(col("v") * col("n") * 2).cast("long").as("cnt2"))
      .orderBy("media_id", "pos")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_resize" -> mmResize _,
    "dedup_exact" -> dedupExact _,
    "dedup_ngram_jaccard" -> dedupJaccard _,
    "dedup_clusters" -> dedupClusters _,
    "text_token_stats" -> tokenStats _,
    "text_quality" -> quality _,
    "text_repetition" -> repetition _,
    "text_source_cap" -> sourceCap _,
    "text_corpus_stats" -> corpusStats _,
    "text_ngram_freq" -> ngramFreq _,
    "text_decontaminate" -> decontaminate _,
    "text_langid" -> langId _,
    "text_fingerprint" -> fingerprint _,
    "text_rolling_fp" -> rollingFp _,
    "text_hash_split" -> hashSplit _,
    "sim_cosine_topk" -> simTopK _,
    "embed_norms" -> embedNorms _,
    "mm_meta" -> mmMeta _,
    "mm_frames" -> mmFrames _,
    "mm_features" -> mmFeatures _,
    "dedup_minhash_lsh" -> dedupMinhashLsh _,
    "dedup_simhash" -> dedupSimhash _,
    "dedup_simhash_pairs" -> dedupSimhashPairs _,
    "pipeline_prepare" -> pipelinePrepare _,
    "sim_ann_lsh" -> simAnnLsh _,
    "sim_ann_ivf" -> simAnnIvf _,
    "embed_near_dups" -> embedNearDups _,
    "embed_near_dups_multi" -> embedNearDupsMulti _,
    "embed_kmeans_clusters" -> embedKmeans _,
  )

  private val enList = TextAnalysis.enStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")
  private val esList = TextAnalysis.esStopwords
    .map(w => s"'$w'").mkString("[", ", ", "]")

  /** DuckDB replica of `Similarity.fitCentroids` + `ivfTopK`: Lloyd
    * iterations are UNROLLED into CTE blocks (assignment -> rounded
    * per-dimension means -> carry-forward for emptied cells), mirroring
    * the Spark side's determinism contract (round-6 sims/means, ties
    * by cell id) so the fitted quantizer is bit-identical across
    * engines.
    */
  /** The fit + whole-corpus assignment prefix (through the `assign`
    * CTE) — shared by the IVF top-k oracle and the cluster-assignment
    * oracle.
    */
  private[operators] def ivfFitAssignSql(nCells: Int, iters: Int,
      fitSampleMod: Int, mat: Boolean = false): String = {
    // fit-sample keep rule — identical to Similarity.fitKeep: first
    // two md5 hex digits of "ivfs:<id>" as a 0..255 bucket, keep
    // bucket % mod == 0; init = the nCells smallest sampled ids
    //
    // `mat` marks every CTE MATERIALIZED: DuckDB 1.0 inlines CTEs by
    // default, so a consumer that references `assign`/`cent$iters`
    // several more levels deep (the IVFPQ oracle) re-evaluates the
    // whole Lloyd chain per reference — exponential in CTE depth.
    val M = if (mat) "MATERIALIZED " else ""
    val b = new StringBuilder
    b ++= s"""WITH ee AS $M(
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
    CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), ef AS $M(
  SELECT * FROM ee WHERE
    ((strpos('0123456789abcdef',
        substr(md5('ivfs:' || vec_id), 1, 1)) - 1) * 16
     + (strpos('0123456789abcdef',
        substr(md5('ivfs:' || vec_id), 2, 1)) - 1)) % $fitSampleMod = 0
), norms AS $M(
  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
), cent0 AS $M(
  SELECT vec_id AS cell, i, x AS m FROM ef
  WHERE vec_id IN (SELECT vec_id FROM (
    SELECT DISTINCT vec_id FROM ef ORDER BY vec_id LIMIT $nCells))
)"""
    for (it <- 1 to iters) {
      val p = it - 1
      b ++= s""", cn$p AS $M(
  SELECT cell, sqrt(SUM(m * m)) AS cnrm FROM cent$p GROUP BY cell
), cd$it AS $M(
  SELECT v.vec_id, c.cell, SUM(v.x * c.m) AS dot
  FROM ef v JOIN cent$p c ON v.i = c.i
  GROUP BY v.vec_id, c.cell
), asg$it AS $M(
  SELECT vec_id, cell FROM (
    SELECT d.vec_id, d.cell,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
        ROUND(d.dot / (nv.nrm * cc.cnrm), 6) DESC, d.cell) AS rn
    FROM cd$it d
    JOIN norms nv ON nv.vec_id = d.vec_id
    JOIN cn$p cc ON cc.cell = d.cell) z
  WHERE rn = 1
), cm$it AS $M(
  SELECT a.cell, e.i, ROUND(AVG(e.x), 6) AS m
  FROM asg$it a JOIN ef e ON e.vec_id = a.vec_id
  GROUP BY a.cell, e.i
), cent$it AS $M(
  SELECT * FROM cm$it
  UNION ALL
  SELECT p.* FROM cent$p p
  WHERE p.cell NOT IN (SELECT cell FROM cm$it)
)"""
    }
    b ++= s""", cnF AS $M(
  SELECT cell, sqrt(SUM(m * m)) AS cnrm FROM cent$iters GROUP BY cell
), cdF AS $M(
  SELECT v.vec_id, c.cell, SUM(v.x * c.m) AS dot
  FROM ee v JOIN cent$iters c ON v.i = c.i
  GROUP BY v.vec_id, c.cell
), assign AS $M(
  SELECT vec_id, cell FROM (
    SELECT d.vec_id, d.cell,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
        ROUND(d.dot / (nv.nrm * cc.cnrm), 6) DESC, d.cell) AS rn
    FROM cdF d
    JOIN norms nv ON nv.vec_id = d.vec_id
    JOIN cnF cc ON cc.cell = d.cell) z
  WHERE rn = 1
)"""
    b.toString
  }

  private def ivfKmeansOracleSql(nCells: Int, iters: Int, k: Int,
      nQ: Int, fitSampleMod: Int): String =
    ivfFitAssignSql(nCells, iters, fitSampleMod) + s""", dots AS (
  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
  WHERE q.vec_id < $nQ
  GROUP BY q.vec_id, e.vec_id
), sims AS (
  SELECT d.q_id, d.n_id, aq.cell,
    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
  FROM dots d
  JOIN assign aq ON aq.vec_id = d.q_id
  JOIN assign an ON an.vec_id = d.n_id AND an.cell = aq.cell
  JOIN norms nq ON nq.vec_id = d.q_id
  JOIN norms ne ON ne.vec_id = d.n_id
), ranked AS (
  SELECT q_id, n_id, cell, sim,
    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
      AS rank
  FROM sims)
SELECT q_id, n_id, cell, sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= $k ORDER BY q_id, rank"""

  /** Whole-corpus cluster assignment with per-cluster sizes — the
    * curation primitive (topic buckets for mixing/dedup/analysis).
    */
  private def kmeansAssignOracleSql(nCells: Int, iters: Int,
      fitSampleMod: Int): String =
    ivfFitAssignSql(nCells, iters, fitSampleMod) +
      """, csz AS (
  SELECT cell, COUNT(*) AS cluster_size FROM assign GROUP BY cell)
SELECT a.vec_id, a.cell, CAST(c.cluster_size AS BIGINT) AS cluster_size
FROM assign a JOIN csz c ON c.cell = a.cell
ORDER BY a.vec_id"""

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY content_hash""".stripMargin,
    "dedup_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
        |), sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |common AS (
        |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS common
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
        |  GROUP BY a.id, b.id)
        |SELECT id_a, id_b, common,
        |  CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.id = id_a
        |JOIN sizes sb ON sb.id = id_b
        |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (
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
        |pairs AS (
        |  SELECT id_a, id_b FROM common
        |  JOIN sizes sa ON sa.id = id_a
        |  JOIN sizes sb ON sb.id = id_b
        |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |walk(a, b) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b)
        |SELECT a AS id, MIN(b) AS cluster,
        |  (a = MIN(b)) AS is_canonical
        |FROM walk GROUP BY a ORDER BY a""".stripMargin,
    "text_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" -> (
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS len,
         |    CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
         |    string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, len, CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len - n_spaces AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS avg_tok_len,
         |    CAST(len(list_filter(tk, x -> list_contains($enList, lower(x)))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE) AS stop_ratio
         |  FROM base)
         |SELECT doc_id, len, n_tokens, avg_tok_len, stop_ratio,
         |  (stop_ratio >= 0.02 AND avg_tok_len BETWEEN 2.0 AND 12.0) AS quality_ok
         |FROM m ORDER BY doc_id""".stripMargin),
    "text_ngram_freq" ->
      """WITH toks AS (
        |  SELECT list_transform(string_split_regex(trim(text), '\s+'),
        |    t -> lower(t)) AS tk
        |  FROM documents
        |), g AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |    i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM toks WHERE len(tk) >= 2)
        |SELECT gram, CAST(count(*) AS BIGINT) AS n
        |FROM g GROUP BY gram
        |ORDER BY n DESC, gram LIMIT 25""".stripMargin,
    "text_corpus_stats" ->
      """WITH toks AS (
        |  SELECT lower(t.tok) AS tok FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |    FROM documents) t
        |), tc AS (
        |  SELECT tok, count(*) AS c FROM toks GROUP BY tok
        |), ts AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
        |    CAST(count(*) AS BIGINT) AS vocab_size,
        |    CAST(MAX(c) AS BIGINT) AS top_token_n
        |  FROM tc
        |), g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(strlen(text)) AS BIGINT) AS total_chars
        |  FROM documents)
        |SELECT g.n_docs, g.total_chars, ts.total_tokens, ts.vocab_size,
        |  ts.top_token_n,
        |  CAST(ts.total_tokens AS DOUBLE) / CAST(g.n_docs AS DOUBLE)
        |    AS avg_doc_tokens
        |FROM g, ts""".stripMargin,
    "text_source_cap" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(text), doc_id) AS BIGINT) AS src_rank
        |  FROM documents)
        |SELECT doc_id, source, src_rank, (src_rank <= 15) AS kept
        |FROM r ORDER BY doc_id""".stripMargin,
    "text_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id AS id,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' ||
        |      tk[i+3] || ' ' || tk[i+4] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 3, 1))) AS r(i)
        |), bench AS (
        |  SELECT DISTINCT shingle FROM sh WHERE id < 10
        |), hits AS (
        |  SELECT DISTINCT id FROM sh JOIN bench USING (shingle))
        |SELECT d.doc_id, (h.id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      t -> lower(t)) AS tk
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens FROM base
        |), uni AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |    CAST(max(c) AS BIGINT) AS top_token_count
        |  FROM (SELECT doc_id, g, count(*) AS c
        |        FROM (SELECT doc_id, unnest(tk) AS g FROM b)
        |        GROUP BY doc_id, g)
        |  GROUP BY doc_id
        |), bi AS (
        |  SELECT doc_id,
        |    CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |    CAST(max(c) AS BIGINT) AS top_bigram_count
        |  FROM (SELECT doc_id, g, count(*) AS c
        |        FROM (SELECT doc_id,
        |                unnest(list_transform(range(1, len(tk)),
        |                  i -> tk[i] || ' ' || tk[i+1])) AS g
        |              FROM b WHERE len(tk) >= 2)
        |        GROUP BY doc_id, g)
        |  GROUP BY doc_id
        |), m AS (
        |  SELECT b.doc_id, b.n_tokens,
        |    uni.n_distinct_tokens, uni.top_token_count,
        |    COALESCE(bi.n_distinct_bigrams, 0) AS n_distinct_bigrams,
        |    COALESCE(bi.top_bigram_count, 0) AS top_bigram_count,
        |    CAST(b.n_tokens - uni.n_distinct_tokens AS DOUBLE)
        |      / CAST(b.n_tokens AS DOUBLE) AS dup_token_frac,
        |    CAST(uni.top_token_count AS DOUBLE)
        |      / CAST(b.n_tokens AS DOUBLE) AS top_token_frac,
        |    CASE WHEN b.n_tokens >= 2 THEN
        |      CAST(b.n_tokens - 1 - COALESCE(bi.n_distinct_bigrams, 0) AS DOUBLE)
        |        / CAST(b.n_tokens - 1 AS DOUBLE) ELSE 0.0 END AS dup_bigram_frac,
        |    CASE WHEN b.n_tokens >= 2 THEN
        |      CAST(COALESCE(bi.top_bigram_count, 0) AS DOUBLE)
        |        / CAST(b.n_tokens - 1 AS DOUBLE) ELSE 0.0 END AS top_bigram_frac
        |  FROM b
        |  LEFT JOIN uni ON uni.doc_id = b.doc_id
        |  LEFT JOIN bi ON bi.doc_id = b.doc_id)
        |SELECT doc_id, n_tokens, n_distinct_tokens, top_token_count,
        |  n_distinct_bigrams, top_bigram_count, dup_token_frac,
        |  top_token_frac, dup_bigram_frac, top_bigram_frac,
        |  (top_token_frac <= 0.2 AND dup_bigram_frac <= 0.6) AS rep_ok
        |FROM m ORDER BY doc_id""".stripMargin,
    "text_langid" -> (
      s"""WITH base AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents
         |), m AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(tk, x -> list_contains($enList, lower(x)))) AS BIGINT) AS en_hits,
         |    CAST(len(list_filter(tk, x -> list_contains($esList, lower(x)))) AS BIGINT) AS es_hits
         |  FROM base)
         |SELECT doc_id, en_hits, es_hits,
         |  CASE WHEN en_hits > es_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits > en_hits AND es_hits > 0 THEN 'es'
         |       ELSE 'unk' END AS lang_guess
         |FROM m ORDER BY doc_id""".stripMargin),
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    // base-257 rolling hash over UTF-8 bytes, HUGEINT mod 2^64 ->
    // signed BIGINT: bit-exact replica of the codegen'd RollingHash
    "text_rolling_fp" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents
        |), it(doc_id, i, n, hx, h) AS (
        |  SELECT doc_id, 0, n, hx, CAST(0 AS HUGEINT) FROM b
        |  UNION ALL
        |  SELECT doc_id, i + 1, n, hx,
        |    (h * 257
        |      + (strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1) * 16
        |      + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
        |    ) % CAST(18446744073709551616 AS HUGEINT)
        |  FROM it WHERE i < n
        |)
        |SELECT doc_id,
        |  CAST(CASE WHEN h >= CAST(9223372036854775808 AS HUGEINT)
        |    THEN h - CAST(18446744073709551616 AS HUGEINT)
        |    ELSE h END AS BIGINT) AS rolling_fp
        |FROM it WHERE i = n ORDER BY doc_id""".stripMargin,
    // composite prep pipeline: chains the quality / exact-dedup /
    // LSH-cluster / split oracles over a shrinking survivor set
    "pipeline_prepare" -> (
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id, text,
         |    CAST(length(text) AS BIGINT) AS len,
         |    CAST(length(text) - length(replace(text, ' ', ''))
         |      AS BIGINT) AS n_spaces,
         |    string_split_regex(trim(text), '\\s+') AS tk
         |  FROM documents
         |), q AS (
         |  SELECT doc_id, text FROM base
         |  WHERE CAST(len(list_filter(tk,
         |      x -> list_contains($enList, lower(x)))) AS DOUBLE)
         |      / CAST(len(tk) AS DOUBLE) >= 0.02
         |    AND CAST(len - n_spaces AS DOUBLE) / CAST(len(tk) AS DOUBLE)
         |      BETWEEN 2.0 AND 12.0
         |), keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
         |), ed AS (
         |  SELECT q.doc_id, q.text FROM q JOIN keep USING (doc_id)
         |), toks AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         |  FROM ed
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
         |pairs AS (
         |  SELECT id_a, id_b FROM common
         |  JOIN sizes sa ON sa.id = id_a
         |  JOIN sizes sb ON sb.id = id_b
         |  WHERE CAST(common AS DOUBLE)
         |    / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1),
         |edges AS (
         |  SELECT id_a AS a, id_b AS b FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM edges),
         |walk(a, b) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b),
         |clusters AS (
         |  SELECT a AS id, MIN(b) AS cluster FROM walk GROUP BY a),
         |canon AS (
         |  SELECT ed.doc_id, ed.text
         |  FROM ed LEFT JOIN clusters c ON c.id = ed.doc_id
         |  WHERE c.id IS NULL OR c.cluster = ed.doc_id
         |), sp AS (
         |  SELECT doc_id,
         |    CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
         |       + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)
         |      AS BIGINT) AS bucket
         |  FROM canon)
         |SELECT doc_id, bucket,
         |  CASE WHEN bucket < 204 THEN 'train'
         |       WHEN bucket < 230 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM sp ORDER BY doc_id""".stripMargin),
    "text_hash_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
        |       + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1)
        |      AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 204 THEN 'train'
        |       WHEN bucket < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "sim_cosine_topk" ->
      """WITH qe AS (
        |  SELECT vec_id AS q_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings WHERE vec_id < 8
        |), ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT qe.q_id, ee.vec_id, SUM(qe.x * ee.x) AS dot
        |  FROM qe JOIN ee ON qe.i = ee.i AND qe.q_id <> ee.vec_id
        |  GROUP BY qe.q_id, ee.vec_id
        |), sims AS (
        |  SELECT d.q_id, d.vec_id AS n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.vec_id
        |), ranked AS (
        |  SELECT q_id, n_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
        |  FROM sims)
        |SELECT q_id, n_id, sim, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,
    "embed_norms" ->
      """WITH ee AS (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings)
        |SELECT e.vec_id, CAST(len(e.embedding) AS BIGINT) AS dim,
        |  ROUND(sqrt(SUM(ee.x * ee.x)), 6) AS norm_r
        |FROM embeddings e JOIN ee ON ee.vec_id = e.vec_id
        |GROUP BY e.vec_id, len(e.embedding)
        |ORDER BY e.vec_id""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id AS media_id, 'raw/utf-8' AS format,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes, md5(text) AS checksum
        |FROM documents ORDER BY media_id""".stripMargin,
    // frame slicing replayed on VARCHAR: the fixture corpus is pure
    // ASCII (verified octet_length(encode(text)) == length(text) for
    // every row), so char positions == byte positions; the engine
    // side slices real bytes
    "mm_resize" ->
      """WITH c AS (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, 4)) AS pos
        |  FROM documents)
        |SELECT media_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(len(list_filter(
        |    list_transform(string_split(text, ''), ch -> (ord(ch) % 8) // 2),
        |    x -> x = pos)) AS BIGINT) AS cnt2
        |FROM c ORDER BY media_id, pos""".stripMargin,
    "mm_features" ->
      """WITH c AS (
        |  SELECT doc_id AS media_id, text,
        |    unnest(range(0, 8)) AS pos
        |  FROM documents)
        |SELECT media_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(len(list_filter(
        |    list_transform(string_split(text, ''), ch -> ord(ch) % 8),
        |    x -> x = pos)) AS BIGINT) AS cnt
        |FROM c ORDER BY media_id, pos""".stripMargin,
    "mm_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes
        |  FROM documents
        |), f AS (
        |  SELECT media_id, text,
        |    unnest(range(0, greatest(
        |      CAST(ceil(n_bytes / 64.0) AS BIGINT), 1), 2)) AS frame_no
        |  FROM m)
        |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
        |  md5(substring(text, CAST(frame_no * 64 + 1 AS BIGINT), 64))
        |    AS frame_md5,
        |  CAST(length(substring(text, CAST(frame_no * 64 + 1 AS BIGINT),
        |    64)) AS BIGINT) AS frame_len
        |FROM f ORDER BY media_id, frame_no""".stripMargin,
    "dedup_minhash_lsh" ->
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
        |  GROUP BY c.id_a, c.id_b)
        |SELECT id_a, id_b,
        |  CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
        |FROM common
        |JOIN sizes sa ON sa.id = id_a
        |JOIN sizes sb ON sb.id = id_b
        |WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash" ->
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
        |  GROUP BY id, bit)
        |SELECT id,
        |  CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (59 - bit)
        |      ELSE 0 END) AS BIGINT) AS simhash
        |FROM votes GROUP BY id ORDER BY id""".stripMargin,
    // banded pair search is pigeonhole-exact, so the brute-force
    // all-pairs filter is the oracle
    "dedup_simhash_pairs" ->
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
        |  FROM votes GROUP BY id)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
        |FROM fps a JOIN fps b ON a.id < b.id
        |WHERE bit_count(xor(a.fp, b.fp)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "sim_ann_lsh" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
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
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.x * e.x) AS dot
        |  FROM ee q JOIN ee e ON q.i = e.i AND q.vec_id <> e.vec_id
        |  WHERE q.vec_id < 8
        |  GROUP BY q.vec_id, e.vec_id
        |), sims AS (
        |  SELECT d.q_id, d.n_id, be.bucket,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN buckets bq ON bq.vec_id = d.q_id
        |  JOIN buckets be ON be.vec_id = d.n_id AND be.bucket = bq.bucket
        |  JOIN norms nq ON nq.vec_id = d.q_id
        |  JOIN norms ne ON ne.vec_id = d.n_id
        |), ranked AS (
        |  SELECT q_id, n_id, bucket, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id)
        |      AS rank
        |  FROM sims)
        |SELECT q_id, n_id, bucket, sim, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "sim_ann_ivf" -> ivfKmeansOracleSql(16, 2, 5, 8, 2),
    "embed_kmeans_clusters" -> kmeansAssignOracleSql(16, 2, 2),
    "embed_near_dups" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), contrib AS (
        |  SELECT vec_id, p,
        |    SUM(x * CASE WHEN substr(md5(p || ',' || (i - 1)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
        |      AS c
        |  FROM ee, UNNEST(range(0, 4)) AS pl(p)
        |  GROUP BY vec_id, p
        |), buckets AS (
        |  SELECT vec_id,
        |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY p) AS bucket
        |  FROM contrib GROUP BY vec_id
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, SUM(a.x * b.x) AS dot
        |  FROM ee a JOIN ee b ON a.i = b.i AND a.vec_id < b.vec_id
        |  JOIN buckets ba ON ba.vec_id = a.vec_id
        |  JOIN buckets bb ON bb.vec_id = b.vec_id AND bb.bucket = ba.bucket
        |  GROUP BY a.vec_id, b.vec_id
        |)
        |SELECT id_a, id_b,
        |  ROUND(dot / (na.nrm * nb.nrm), 6) AS sim
        |FROM dots
        |JOIN norms na ON na.vec_id = id_a
        |JOIN norms nb ON nb.vec_id = id_b
        |WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.35
        |ORDER BY id_a, id_b""".stripMargin,
    "embed_near_dups_multi" ->
      """WITH ee AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), contrib AS (
        |  SELECT vec_id, t, p,
        |    SUM(x * CASE WHEN substr(md5((t * 1000 + p) || ',' ||
        |        (i - 1)), 1, 1)
        |      IN ('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END)
        |      AS c
        |  FROM ee, UNNEST(range(0, 3)) AS tt(t),
        |    UNNEST(range(0, 8)) AS pl(p)
        |  GROUP BY vec_id, t, p
        |), buckets AS (
        |  SELECT vec_id, t,
        |    string_agg(CASE WHEN c >= 0 THEN '1' ELSE '0' END, ''
        |      ORDER BY p) AS bucket
        |  FROM contrib GROUP BY vec_id, t
        |), cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b
        |    ON b.t = a.t AND b.bucket = a.bucket AND a.vec_id < b.vec_id
        |), norms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee GROUP BY vec_id
        |), dots AS (
        |  SELECT c.id_a, c.id_b, SUM(a.x * b.x) AS dot
        |  FROM cand c
        |  JOIN ee a ON a.vec_id = c.id_a
        |  JOIN ee b ON b.vec_id = c.id_b AND b.i = a.i
        |  GROUP BY c.id_a, c.id_b
        |)
        |SELECT id_a, id_b,
        |  ROUND(dot / (na.nrm * nb.nrm), 6) AS sim
        |FROM dots
        |JOIN norms na ON na.vec_id = id_a
        |JOIN norms nb ON nb.vec_id = id_b
        |WHERE ROUND(dot / (na.nrm * nb.nrm), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
