package graft

import graft.operators.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style unit checks for the extension operator library
  * (the oracle suite covers end-to-end values; these pin algebraic
  * invariants).
  */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap at all"),
    (4L, "the quick brown fox jumps over the lazy dog"), // dup of 1
    (5L, "ab")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val d = Dedup.exact(docs, "doc_id", "text")
    val dupGroup = d.filter($"n_dups" === 2).head()
    assert(dupGroup.getAs[Long]("keep_id") === 1L)
    assert(d.count() === 4) // 5 docs, one pair merged
  }

  test("jaccard: identical docs = 1.0, near docs high, disjoint absent") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", minJ = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Double]("jaccard"))).toMap
    assert(pairs(((1L, 4L))) === 1.0)
    assert(pairs(((1L, 2L))) > 0.5 && pairs((1L, 2L)) < 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("stop-shingle cap: default is exact; cap drops boilerplate-only " +
      "pairs and bounds fan-out") {
    // boilerplate prefix shared by 4 docs; docs 10/11 share ONLY it
    val corpus = Seq(
      (10L, "terms of service apply here alpha beta gamma"),
      (11L, "terms of service apply here delta epsilon zeta"),
      (12L, "terms of service apply here red green blue teal"),
      (13L, "terms of service apply here one two three four"),
      (14L, "rare shingle payload xyzzy plugh quux deep content"),
      (15L, "rare shingle payload xyzzy plugh quux deep matter")
    ).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(corpus, "doc_id", "text", minJ = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dflt = Dedup.jaccardPairs(corpus, "doc_id", "text", minJ = 0.1,
        maxDf = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dflt === exact) // MaxValue degenerates to exact semantics
    assert(exact.contains((10L, 11L))) // boilerplate relates them
    val capped = Dedup.jaccardPairs(corpus, "doc_id", "text",
        minJ = 0.1, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // boilerplate-only pairs drop; rare-content pairs survive
    assert(!capped.contains((10L, 11L)))
    assert(capped.contains((14L, 15L)))
  }

  test("short doc below shingle width produces no shingles, no crash") {
    val sh = Dedup.shingles(docs.filter($"doc_id" === 5L), "doc_id", "text")
    assert(sh.count() === 0)
  }

  test("minhash-lsh finds the exact dup and the near dup") {
    val got = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numHashes = 16, bands = 4, minJ = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 4L))) // identical: all bands collide
  }

  test("simhash: identical docs identical fingerprints, near docs close") {
    val fp = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(2L)) < hamming(fp(1L), fp(3L)))
  }

  test("cosine: self-similarity 1, topk ranks dup first") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(0.9f, 0.1f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(emb, emb.filter($"vec_id" === 1L),
      "vec_id", "embedding", k = 3).collect()
    assert(top.head.getAs[Long]("n_id") === 2L)
    assert(top.head.getAs[Double]("sim") === 1.0)
  }

  test("srp bucket: identical vectors identical buckets") {
    val emb = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.fill(8)(-0.5f))
    ).toDF("vec_id", "embedding")
    val b = emb.withColumn("bucket",
        Similarity.srpBucket(col("embedding"), 4, 8))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // antipodal vectors flip every plane
  }

  test("language id prefers english stopwords") {
    val d = Seq((1L, "the cat and the dog in the house"),
      (2L, "el gato y la casa de que en")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(d, "text")
      .collect().map(r => r.getLong(0) -> r.getAs[String]("lang_guess"))
      .toMap
    assert(got(1L) === "en")
    assert(got(2L) === "es")
  }

  test("fingerprint is whitespace/punct/case-insensitive") {
    val d = Seq((1L, "Hello,  World!"), (2L, "hello world"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(d, "text")
      .select("fp").as[String].collect()
    assert(fps(0) === fps(1))
  }
}
