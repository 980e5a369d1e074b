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
