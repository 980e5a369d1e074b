package graft

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization ANN: determinism, recall sanity on clustered
  * data, and the plan contract (corpus side is a narrow projection —
  * the one shuffle is the per-query top-k window).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def emb = spark.read
    .parquet(s"${TestSpark.sfDir}/embeddings.parquet")

  test("adcTopK is deterministic across runs") {
    def run() = Pq.adcTopK(emb, emb.filter(col("vec_id") < 4),
        "vec_id", "embedding", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    assert(run() === run())
  }

  test("recall@5 on clustered data: PQ finds same-cluster neighbours") {
    import spark.implicits._
    // 8 clusters of 25 vectors in 16 dims (same fixture family as
    // IvfKmeansSpec): PQ codes must keep same-cluster vectors close
    val dims = 16; val perCluster = 25; val nClusters = 8
    val rows = (0 until nClusters * perCluster).map { id =>
      val c = id / perCluster
      val raw = Array.tabulate(dims) { j =>
        val center = if (j == c * 2) 1.0 else 0.0
        center + 0.15 * math.sin(id * 131.0 + j * 7.0)
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (id.toLong, raw.map(x => (x / nrm).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.cosineTopK(corpus, qs, "vec_id",
        "embedding", 5)
      .select(col("q_id"), col("n_id"))
    val pq = Pq.adcTopK(corpus, qs, "vec_id", "embedding", topK = 5,
      nSub = 4, k = 8, iters = 2, sampleMod = 1)
    val hit = pq.select(col("q_id"), col("n_id"))
      .join(exact, Seq("q_id", "n_id"), "left_semi").count()
    val recall = hit.toDouble / exact.count()
    info(f"PQ recall@5 on clustered fixture: $recall%.3f")
    assert(recall >= 0.5, f"PQ recall $recall%.3f unexpectedly low")
    // and every PQ neighbour is in the query's own cluster — the
    // coarse structure codes must preserve
    val wrong = pq.filter(expr("n_id div 25") =!= expr("q_id div 25"))
      .count()
    assert(wrong === 0L, s"$wrong cross-cluster neighbours")
  }

  test("exact re-rank recovers recall the codes lose") {
    import spark.implicits._
    val dims = 16; val perCluster = 25; val nClusters = 8
    val rows = (0 until nClusters * perCluster).map { id =>
      val c = id / perCluster
      val raw = Array.tabulate(dims) { j =>
        val center = if (j == c * 2) 1.0 else 0.0
        center + 0.15 * math.sin(id * 131.0 + j * 7.0)
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (id.toLong, raw.map(x => (x / nrm).toFloat))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.cosineTopK(corpus, qs, "vec_id",
        "embedding", 5)
      .select(col("q_id"), col("n_id"))
    def recallOf(ann: org.apache.spark.sql.DataFrame): Double =
      ann.select(col("q_id"), col("n_id"))
        .join(exact, Seq("q_id", "n_id"), "left_semi").count()
        .toDouble / exact.count()
    val rPlain = recallOf(Pq.adcTopK(corpus, qs, "vec_id",
      "embedding", topK = 5, nSub = 4, k = 8, iters = 2,
      sampleMod = 1))
    val rRerank = recallOf(Pq.rerankTopK(corpus, qs, "vec_id",
      "embedding", shortlist = 20, topK = 5, nSub = 4, k = 8,
      iters = 2, sampleMod = 1))
    info(f"recall@5 plain ADC=$rPlain%.3f, reranked=$rRerank%.3f")
    assert(rRerank >= rPlain,
      f"rerank $rRerank%.3f worse than plain $rPlain%.3f")
    assert(rRerank >= 0.9, f"reranked recall $rRerank%.3f low")
  }

  test("corpus scoring is a narrow projection: one shuffle (the topk " +
      "window), codes never join") {
    val df = Pq.adcTopK(emb, emb.filter(col("vec_id") < 4), "vec_id",
      "embedding", topK = 5)
    val p = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(shuffles <= 1, p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
