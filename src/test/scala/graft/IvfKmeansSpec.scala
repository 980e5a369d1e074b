package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** K-means IVF quantizer: deterministic fit, and recall@k at least as
  * good as the first-N-vectors quantizer it replaces (on the driver
  * fixture it is strictly better for the probed queries).
  */
class IvfKmeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def emb = spark.read
    .parquet(s"${TestSpark.sfDir}/embeddings.parquet")

  def queries = emb.filter(col("vec_id") < 8)

  /** recall@k of an ANN result against exact brute-force top-k. */
  def recall(ann: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val exact = Similarity.cosineTopK(emb, queries, "vec_id",
        "embedding", k)
      .select(col("q_id"), col("n_id"))
    val hit = ann.select(col("q_id"), col("n_id"))
      .join(exact, Seq("q_id", "n_id"), "left_semi").count()
    hit.toDouble / exact.count()
  }

  test("fitCentroids is deterministic across runs") {
    def fit() = Similarity.fitCentroids(emb, "vec_id", "embedding",
        nCells = 8, iters = 2)
      .orderBy("cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val a = fit(); val b = fit()
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
  }

  /** Deterministic clustered corpus where the first-N quantizer is
    * pathological: ids are ordered so ALL first-8 seeds fall in
    * cluster 0. (The driver's synthetic embeddings are uniform on the
    * sphere — no cluster structure — so quantizer quality is
    * indistinguishable there; real embedding corpora are clustered,
    * which is the case IVF exists for.)
    */
  def clustered: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dims = 16; val perCluster = 25; val nClusters = 8
    val rows = (0 until nClusters * perCluster).map { id =>
      val c = id / perCluster // first 25 ids (incl. seeds 0-7): cluster 0
      val raw = Array.tabulate(dims) { j =>
        val center = if (j == c * 2) 1.0 else 0.0
        center + 0.15 * math.sin(id * 131.0 + j * 7.0) // deterministic
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (id.toLong, raw.map(x => (x / nrm).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("k-means quantizer recovers from pathological first-N init: " +
      "recall strictly better on clustered data") {
    val k = 5
    val corpus = clustered
    val qs = corpus.filter(col("vec_id") % 25 === 0) // one per cluster
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.cosineTopK(corpus, qs, "vec_id",
          "embedding", k)
        .select(col("q_id"), col("n_id"))
      ann.select(col("q_id"), col("n_id"))
        .join(exact, Seq("q_id", "n_id"), "left_semi").count()
        .toDouble / exact.count()
    }
    val rFirst = recallOf(Similarity.ivfTopK(corpus, qs, "vec_id",
      "embedding", k, nCells = 8))
    val rFit = recallOf(Similarity.ivfTopK(corpus, qs, "vec_id",
      "embedding", k, nCells = 8, kmeansIters = 3))
    info(f"clustered recall@$k first-N=$rFirst%.3f kmeans=$rFit%.3f")
    assert(rFit > rFirst,
      f"kmeans recall $rFit%.3f not better than first-N $rFirst%.3f")
    assert(rFit >= 0.6, f"kmeans recall $rFit%.3f unexpectedly low")
  }

  test("empty cells keep their previous centroid") {
    import spark.implicits._
    // 4 clumped vectors + 2 centroids: one centroid ends up empty
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(-1.0f, 0.05f)),
      (2L, Array(0.99f, 0.01f)), (3L, Array(0.98f, -0.01f)),
      (4L, Array(0.97f, 0.02f))).toDF("vec_id", "embedding")
    val cents = Similarity.fitCentroids(tiny, "vec_id", "embedding",
      nCells = 2, iters = 3).orderBy("cell").collect()
    assert(cents.length === 2) // emptied cell survived with old centroid
  }
}
