package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY.md §7.5):
  * tokenization, quality scoring, language-ID heuristic, document
  * fingerprinting. All pure Column expressions (codegen'd, no UDFs) —
  * a single narrow projection stage at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the BPE-ish regex split of the brief). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  val enStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "in", "to", "is")
  val esStopwords: Seq[String] =
    Seq("el", "la", "de", "que", "y", "en", "es")

  private def hits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => lower(x).isin(words.map(lit): _*)))

  /** BPE-ish subword pre-tokenizer regex (letter runs / digit runs /
    * single punctuation — the GPT-2-style split shape, engine-portable).
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting: whitespace tokens, BPE-ish subword count,
    * char length.
    */
  def tokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_bpeish",
        size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
          .cast("long"))
      .withColumn("n_chars_calc", length(col(textCol)).cast("long"))
  }

  /** Quality scoring: length / whitespace / stopword ratios. Ratios are
    * exact-integer divisions in double, so they are bit-identical across
    * engines.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val len = length(text).cast("long")
    val nSpaces = (len - length(regexp_replace(text, " ", ""))).cast("long")
    val nTokens = size(toks).cast("long")
    val stopHits = hits(toks, enStopwords).cast("long")
    df.withColumn("len", len)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_tok_len",
        (len - nSpaces).cast("double") / nTokens.cast("double"))
      .withColumn("stop_ratio",
        stopHits.cast("double") / nTokens.cast("double"))
      .withColumn("quality_ok",
        col("stop_ratio") >= 0.02 && col("avg_tok_len").between(2.0, 12.0))
  }

  /** Language-ID heuristic: stopword-list voting (en vs es vs unknown). */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val en = hits(toks, enStopwords).cast("long")
    val es = hits(toks, esStopwords).cast("long")
    df.withColumn("en_hits", en).withColumn("es_hits", es)
      .withColumn("lang_guess",
        when(en > es && en > 0, "en")
          .when(es > en && es > 0, "es")
          .otherwise("unk"))
  }

  /** Repetition signals (the Gopher/MassiveText quality-rule family):
    * duplicate-token fraction, most-frequent-token fraction, and
    * bigram repetition (duplicate-bigram fraction + top-bigram
    * fraction). Highly repetitive documents are boilerplate/spam
    * candidates for a training corpus.
    *
    * Shape: explode + two keyed aggregations per gram order — each a
    * hash-partitioned shuffle on (doc, gram), so per-doc work is
    * distributed and never O(doc_len^2) per row (the higher-order-
    * function mode count would be quadratic in document length, which
    * dies on 10k-token documents at 100 TB).
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tk = transform(tokens(col(textCol)), t => lower(t))
    val base = df.select(col(idCol), tk.as("tk"))
      .withColumn("n_tokens", size(col("tk")).cast("long"))
    val uni = base
      .select(col(idCol), explode(col("tk")).as("gram"))
      .groupBy(idCol, "gram").count()
      .groupBy(idCol).agg(
        count(lit(1)).cast("long").as("n_distinct_tokens"),
        max("count").cast("long").as("top_token_count"))
    val bigrams = when(col("n_tokens") >= 2,
      transform(sequence(lit(1), (col("n_tokens") - 1).cast("int")),
        i => concat_ws(" ",
          element_at(col("tk"), i), element_at(col("tk"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val bi = base
      .select(col(idCol), explode(bigrams).as("gram"))
      .groupBy(idCol, "gram").count()
      .groupBy(idCol).agg(
        count(lit(1)).cast("long").as("n_distinct_bigrams"),
        max("count").cast("long").as("top_bigram_count"))
    val nT = col("n_tokens").cast("double")
    val nB = (col("n_tokens") - 1).cast("double")
    base.select(col(idCol), col("n_tokens"))
      .join(uni, Seq(idCol), "left")
      .join(bi, Seq(idCol), "left")
      .withColumn("n_distinct_bigrams",
        coalesce(col("n_distinct_bigrams"), lit(0L)))
      .withColumn("top_bigram_count",
        coalesce(col("top_bigram_count"), lit(0L)))
      .withColumn("dup_token_frac",
        (col("n_tokens") - col("n_distinct_tokens")).cast("double") / nT)
      .withColumn("top_token_frac",
        col("top_token_count").cast("double") / nT)
      .withColumn("dup_bigram_frac",
        when(col("n_tokens") >= 2,
          (col("n_tokens") - 1 - col("n_distinct_bigrams")).cast("double")
            / nB).otherwise(lit(0.0)))
      .withColumn("top_bigram_frac",
        when(col("n_tokens") >= 2,
          col("top_bigram_count").cast("double") / nB).otherwise(lit(0.0)))
      .withColumn("rep_ok",
        col("top_token_frac") <= 0.2 && col("dup_bigram_frac") <= 0.6)
  }

  /** Deterministic stratified cap per source — the data-mixing
    * primitive that bounds each domain's contribution to a corpus.
    * Documents are ranked within their source by content hash (stable
    * across runs, engines and partitionings — no rand()) and the first
    * `cap` survive. One shuffle on source; a pathologically hot source
    * is one window partition, so at extreme skew pre-cap by
    * (source, hash-prefix) before the global rank.
    */
  def sourceCap(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(md5(col(textCol)), col(idCol))
    df.withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("kept", col("src_rank") <= cap)
  }

  /** Per-document top-k terms by TF-IDF — the classic relevance /
    * keyword-extraction signal over a corpus. idf = ln(N / df) rounded
    * to 6 decimals (then the product re-rounded) so libm differences
    * across engines cannot leak into the hash.
    *
    * Scale shape: one (doc, term) count shuffle, one term-level df
    * shuffle, one join back on term (plain shuffle join — vocabulary is
    * generally too big to broadcast), and a per-doc window whose
    * partition size is bounded by document length. No all-pairs, no
    * driver loops; N arrives via a broadcast one-row cross join.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = df.select(col(idCol).as("doc_id"),
      explode(transform(tokens(col(textCol)), t => lower(t))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("idf", round(
        log(col("n_docs").cast("double") / col("df_t").cast("double")), 6))
      .withColumn("score", round(col("tf").cast("double") * col("idf"), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_t"),
        col("score"), col("rank"))
  }

  /** Cross-document duplicated n-gram fraction — the per-position
    * repeated-substring signal (the distributed approximation of
    * suffix-array substring dedup from "Deduplicating Training Data
    * Makes Language Models Better"): for each document, the fraction of
    * its token n-gram positions whose n-gram also appears in at least
    * one OTHER document.
    *
    * Scale shape: positions explode once; gram stats are one count-
    * distinct shuffle keyed on the gram; the mark-back is an equi-join
    * on gram (hot boilerplate grams are the skew risk — salt or
    * pre-aggregate per (gram, doc) first, which the groupBy below
    * already does implicitly via distinct doc counting).
    */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val tk = col("tk")
    val grams = when(size(tk) >= n,
      transform(sequence(lit(1), (size(tk) - (n - 1)).cast("int")),
        i => concat_ws(" ",
          (0 until n).map(o => element_at(tk, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    val pos = df
      .select(col(idCol).as("doc_id"),
        transform(tokens(col(textCol)), t => lower(t)).as("tk"))
      .select(col("doc_id"), explode(grams).as("gram"))
    val stats = pos.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("n_docs_with"))
    val perDoc = pos.join(stats, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_docs_with") >= 2, 1L).otherwise(0L))
          .as("n_dup_grams"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_dup_grams", coalesce(col("n_dup_grams"), lit(0L)))
      .withColumn("dup_frac",
        when(col("n_grams") > 0,
          col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Cross-document substring DEDUP TRANSFORM — the executable
    * counterpart of `dupNgramStats` (the "Deduplicating Training Data"
    * removal step, distributed): every token position covered by an
    * n-gram that also occurs in another document is masked out, and
    * the cleaned document is re-assembled from the surviving tokens in
    * order. Returns per doc: token counts before/after and the md5 of
    * the cleaned text (the pipeline would carry the text itself).
    *
    * Scale shape: gram stats are one count-distinct shuffle on the
    * gram; span coverage is a narrow explode of [p, p+n-1] index
    * ranges; the re-assembly is one per-doc aggregate over an
    * anti-joined token list — everything keys on (doc, ...), nothing
    * is ever pairwise.
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val tk = col("tk")
    val grams = when(size(tk) >= n,
      transform(sequence(lit(0), (size(tk) - n).cast("int")),
        i => struct(i.as("pos"), concat_ws(" ",
          (0 until n).map(o => element_at(tk, i + o + 1)): _*)
          .as("gram"))))
      .otherwise(array().cast("array<struct<pos:int,gram:string>>"))
    val base = df.select(col(idCol).as("doc_id"),
      transform(tokens(col(textCol)), t => lower(t)).as("tk"))
    val pos = base.select(col("doc_id"), explode(grams).as("g"))
      .select(col("doc_id"), col("g.pos").as("pos"),
        col("g.gram").as("gram"))
    val dupGrams = pos.groupBy("gram")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
    // covered token indices: union of [p, p+n-1] over duplicated grams
    val covered = pos.join(dupGrams, "gram")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("idx"))
      .distinct()
    val tokIdx = base.select(col("doc_id"),
      posexplode(col("tk")).as(Seq("idx", "tok")))
    val kept = tokIdx
      .join(covered, Seq("doc_id", "idx"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("idx"), col("tok")))),
          s => s.getField("tok")))).as("kept_md5"))
    base.select(col("doc_id"), size(col("tk")).cast("long")
        .as("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
      .withColumn("n_removed", col("n_tokens") - col("n_kept"))
      .withColumn("kept_md5",
        coalesce(col("kept_md5"), md5(lit(""))))
  }

  /** PII patterns — deliberately RE2-compatible (no lookaround, no
    * backreferences) so the same pattern text runs in Spark (java.util
    * .regex) and DuckDB (RE2), and redaction stays a pure codegen'd
    * projection.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"
  val ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII detection + redaction: count and mask emails, phone numbers
    * and IPv4 literals. Email masking runs first so the later, looser
    * numeric patterns can never match inside an already-masked span.
    * One narrow projection — no shuffle, scales linearly.
    */
  def piiRedact(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val text = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")
    df.select(col(idCol),
      size(regexp_extract_all(text, lit(emailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(text, lit(phonePattern), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(text, lit(ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"),
      md5(redacted).as("red_md5"))
  }

  /** Epoch-based mixture upsampling — the complement of `sourceCap`:
    * replicate each document `epochs` times (epochs driven by source
    * quality tier) with a deterministic per-replica shuffle key, so a
    * training mix can weight domains without rand(). The explode is a
    * narrow generate (row fan-out only, no shuffle); downstream
    * repartition on `mix_key` gives the global shuffle when writing.
    */
  def mixEpochs(df: DataFrame, idCol: String, srcCol: String,
      epochs: Column): DataFrame =
    df.withColumn("epochs", epochs.cast("int"))
      .select(col(idCol), col(srcCol),
        explode(sequence(lit(1), col("epochs"))).as("epoch"))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("mix_key",
        md5(concat(col(idCol).cast("string"), lit("#"),
          col("epoch").cast("string"))))

  /** Per-document mean unigram negative log-likelihood under the
    * corpus's own unigram LM — the cheap KenLM-style fluency /
    * outlier signal (a doc of globally-rare tokens scores high).
    * Token log-probs are quantized to integer MICRO-nats before the
    * per-doc sum, so the aggregate is exact integer arithmetic —
    * no FP-summation-order noise between engines, only the one
    * well-separated round on each ln().
    *
    * Scale shape: token explode → one count shuffle for the LM, one
    * join back on token (vocabulary-sized dimension — hot stopword
    * keys are the skew risk, pre-aggregated here by (doc, tok)
    * first), one per-doc aggregate. Corpus scanned once for counts,
    * once for scoring.
    */
  def unigramLogprob(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(transform(tokens(col(textCol)), t => lower(t))).as("tok"))
    // pre-aggregate per (doc, tok): the LM join then carries one row
    // per distinct token per doc, not one per occurrence
    val docTok = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("n_occ"))
    val lm = docTok.groupBy("tok").agg(sum(col("n_occ")).as("c"))
    val total = lm.agg(sum(col("c")).as("n_total"))
    docTok.join(lm, "tok").crossJoin(broadcast(total))
      .withColumn("lp_micro",
        round(log(col("c").cast("double") / col("n_total").cast("double"))
          * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_tokens"),
        sum(-col("lp_micro") * col("n_occ")).as("sum_nll_micro"))
      .withColumn("avg_nll",
        col("sum_nll_micro").cast("double")
          / col("n_tokens").cast("double") / 1e6)
  }

  /** Bigram-LM document scoring: P(w_i | w_{i-1}) from corpus bigram
    * counts (conditional on the preceding token), per-doc NLL in exact
    * integer micro-nats (same portability contract as
    * [[unigramLogprob]]: each distinct bigram's log-prob is quantized
    * once, so the per-doc sum is order-independent integer math).
    * Scale shape: one (doc,w1,w2) pre-aggregate, the LM is two hash
    * aggregates, and the score join shuffles on the bigram key — no
    * driver-side vocabulary.
    */
  def bigramLogprob(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val tk = transform(tokens(col(textCol)), t => lower(t))
    val bi = df
      .select(col(idCol).as("doc_id"), tk.as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("tk")) - 2),
        i => struct(element_at(col("tk"), i + 1).as("w1"),
          element_at(col("tk"), i + 2).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    val docBi = bi.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("n_occ"))
    val lm12 = docBi.groupBy("w1", "w2").agg(sum("n_occ").as("c12"))
    val lm1 = lm12.groupBy("w1").agg(sum("c12").as("c1"))
    docBi.join(lm12, Seq("w1", "w2")).join(lm1, "w1")
      .withColumn("lp_micro",
        round(log(col("c12").cast("double") / col("c1").cast("double"))
          * 1e6).cast("long"))
      .groupBy("doc_id")
      .agg(sum("n_occ").as("n_bigrams"),
        sum(-col("lp_micro") * col("n_occ")).as("sum_nll_micro"))
      .withColumn("avg_nll",
        col("sum_nll_micro").cast("double")
          / col("n_bigrams").cast("double") / 1e6)
  }

  /** Sequence PACKING for training (concat-and-chunk): documents are
    * laid out in a deterministic global order (content hash, id) and
    * the token stream is cut every `budget` tokens; each document
    * reports its global token offset and the bin range it lands in
    * (documents straddling a cut span two bins — exactly GPT-style
    * packing).
    *
    * The global running offset is a DISTRIBUTED PREFIX SUM, not a
    * single-partition window: documents bucket by the first hex digit
    * of their hash (which PREFIXES the global sort key, so bucket-local
    * order is a contiguous slice of the global order); each bucket
    * computes its local cumulative sum in parallel, and the 16 bucket
    * totals — a broadcast-sized table — turn local sums into global
    * offsets. At 100 TB widen the bucket prefix; the per-bucket window
    * stays the only heavy operator and it parallelizes across buckets.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
        md5(col(textCol)).as("key"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket",
        conv(substring(col("key"), 1, 1), 16, 10).cast("int"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy("key", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val local = base.withColumn("cum_in",
      sum(col("n_tokens")).over(wIn) - col("n_tokens"))
    // 16-row offset table: tokens in all EARLIER buckets
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offsets = base.groupBy("bucket")
      .agg(sum(col("n_tokens")).as("btot"))
      .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
      .select("bucket", "off")
    local.join(broadcast(offsets), "bucket")
      .withColumn("start_off", col("off") + col("cum_in"))
      .withColumn("bin_start", floor(col("start_off") / budget))
      .withColumn("bin_end", floor(
        (col("start_off") + greatest(col("n_tokens"), lit(1L)) - 1)
          / budget))
      .withColumn("n_bins",
        (col("bin_end") - col("bin_start") + 1).cast("long"))
      .select("doc_id", "n_tokens", "start_off", "bin_start",
        "bin_end", "n_bins")
  }

  /** Document fingerprint: md5 over canonicalized text (lowercase,
    * alnum-only, collapsed whitespace) — robust to formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " ")))

  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fp", fingerprint(col(textCol)))

  /** Deterministic train/val/test split assignment by content hash:
    * bucket = first md5 byte (0..255), split on fixed thresholds.
    * Stable across runs, engines, partitionings, and re-shards — the
    * property a 100 TB dataset split must have (no rand()).
    */
  def hashSplit(df: DataFrame, textCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val bucket = conv(substring(md5(col(textCol)), 1, 2), 16, 10)
      .cast("int")
    val tTrain = 256 * trainPct / 100
    val tVal = 256 * (trainPct + valPct) / 100
    df.withColumn("bucket", bucket.cast("long"))
      .withColumn("split",
        when(bucket < tTrain, "train")
          .when(bucket < tVal, "val")
          .otherwise("test"))
  }
}
