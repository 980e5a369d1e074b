package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (SURVEY.md §7.5 similarity-search scale
  * path). PQ is the tool that actually survives 100 TB vector
  * corpora: the 64-dim float vector (256 bytes) compresses to `nSub`
  * one-byte codes (here 4), the codebooks are tiny driver-held
  * literals, and query-time scoring is asymmetric-distance (ADC) — a
  * per-row lookup-table sum over the CODES, never the vectors, so the
  * scan is a narrow codegen'd projection over a corpus ~64× smaller
  * than the raw embeddings. No join against centroids, no shuffle
  * until the per-query top-k window.
  *
  * Cross-engine exactness contract (the IVF playbook, hardened):
  *   - fit on the md5 hash-sample (same "ivfs:" rule as IVF);
  *   - codebook init per subspace = the nSub-dim slices of the
  *     k smallest sampled ids, cells numbered 0..k-1;
  *   - ALL distance comparisons happen in integer micro-units
  *     (round(d² · 1e6) as BIGINT) so argmin ties and rank order are
  *     integer-exact under any partitioning — doubles never cross a
  *     comparison boundary;
  *   - centroid coordinates = per-dim means rounded to 6 decimals.
  */
object Pq {

  /** In-order squared-L2 fold over a double subvector pair. */
  private[operators] def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
      (x, y) => (x.cast("double") - y.cast("double")) *
        (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Spark round(x, n) replica (BigDecimal HALF_UP) for the driver
    * fit — same path as Similarity.round6.
    */
  private def roundN(x: Double, n: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(n, java.math.RoundingMode.HALF_UP).doubleValue()

  private[operators] def microOf(d2: Double): Long =
    java.math.BigDecimal.valueOf(d2 * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Distance of subvector `sub` to literal centroid `cv` in integer
    * micro-units — the single quantity every comparison uses.
    */
  private[operators] def microExpr(sub: Column, cv: Seq[Double]): Column =
    round(l2sq(sub, typedlit(cv)) * 1e6, 0).cast("long")

  /** Driver-side deterministic Lloyd per subspace on the hash sample.
    * Returns codebooks(m)(cell) = centroid coordinates.
    */
  private def fitCodebooks(corpus: DataFrame, idCol: String,
      vecCol: String, nSub: Int, k: Int, iters: Int,
      sampleMod: Int): Array[Array[Array[Double]]] = {
    // the shared bounded sampler (Similarity.fitSample): identical
    // keep rule to the previous inline form at every test/oracle SF,
    // plus the corpus-size-independent collect cap for the 100 TB path
    val sample = Similarity.fitSample(corpus, idCol, vecCol, sampleMod)
    require(sample.nonEmpty,
      s"PQ fit: hash sample (mod $sampleMod) kept no vectors")
    fitCodebooksFromSample(sample, nSub, k, iters)
  }

  /** The subspace-Lloyd core, on an already-collected driver sample
    * sorted by id. Shared by the flat-PQ fit above (raw vectors) and
    * the IVFPQ fit (coarse-cell residuals) — the arithmetic contract
    * (micro-unit argmin, round-6 means, sample-order accumulation) is
    * identical either way.
    */
  private[operators] def fitCodebooksFromSample(
      sample: Array[(Long, Array[Double])], nSub: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val total = sample.head._2.length
    require(total % nSub == 0, s"$total dims must split into $nSub")
    val subDim = total / nSub
    Array.tabulate(nSub) { m =>
      val subs = sample.map { case (id, v) =>
        (id, v.slice(m * subDim, (m + 1) * subDim)) }
      // a sample smaller than k yields a smaller codebook (kEff
      // cells) — degrade, don't crash; the oracle's LIMIT k does the
      // same
      var cents: Array[Array[Double]] =
        subs.take(k).map(_._2.clone())
      val kEff = cents.length
      for (_ <- 0 until iters) {
        val sums = Array.fill(kEff)(new Array[Double](subDim))
        val counts = new Array[Long](kEff)
        subs.foreach { case (_, s) =>
          var best = 0; var bestD = Long.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0; var j = 0
            while (j < subDim) {
              val t = s(j) - cents(c)(j); d += t * t; j += 1
            }
            val dm = microOf(d)
            if (dm < bestD) { bestD = dm; best = c } // tie: lowest cell
            c += 1
          }
          var j = 0
          while (j < subDim) { sums(best)(j) += s(j); j += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(kEff)(c =>
          if (counts(c) == 0) cents(c) // emptied cell keeps centroid
          else sums(c).map(s => roundN(s / counts(c), 6)))
      }
      cents
    }
  }

  /** ADC top-k: encode the corpus to codes, score each query against
    * the codes via its per-(subspace, cell) lookup table, rank by
    * (micro-distance, n_id). `queries` must be small (broadcast).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, topK: Int, nSub: Int = 4, k: Int = 8,
      iters: Int = 1, sampleMod: Int = 2): DataFrame = {
    val books = fitCodebooks(corpus, idCol, vecCol, nSub, k, iters,
      sampleMod)
    val subDim = books(0)(0).length
    def sub(vec: Column, m: Int): Column =
      slice(transform(vec, x => x.cast("double")),
        m * subDim + 1, subDim)
    // corpus side: code_m = argmin_cell micro-distance (tie lowest
    // cell) — array_min over (dm, cell) structs of LITERAL centroids;
    // a narrow projection, nothing joined or shuffled
    def codeExpr(vec: Column, m: Int): Column =
      array_min(array(books(m).zipWithIndex.map { case (cv, c) =>
        struct(microExpr(sub(vec, m), cv.toSeq).as("dm"),
          lit(c).as("c"))
      }: _*)).getField("c")
    val coded = corpus.select(
      col(idCol).cast("long").as("n_id") +:
        (0 until nSub).map(m =>
          codeExpr(col(vecCol), m).as(s"code_$m")): _*)
    // query side: the ADC lookup table — dm to EVERY cell of every
    // subspace codebook, as one literal-indexed array per subspace
    val q = queries.select(
      col(idCol).cast("long").as("q_id") +:
        (0 until nSub).map(m =>
          array(books(m).map(cv =>
            microExpr(sub(col(vecCol), m), cv.toSeq)): _*)
            .as(s"qd_$m")): _*)
    val adist = (0 until nSub).map(m =>
      element_at(col(s"qd_$m"), col(s"code_$m") + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist"), col("n_id"))
    coded.join(broadcast(q), col("n_id") =!= col("q_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("n_id"), col("adist"), col("rank"))
      .orderBy("q_id", "rank")
  }

  /** The full production retrieval shape: ADC scans the CODES for a
    * cheap shortlist (here 20 per query), then only the shortlist
    * pays an exact float-cosine re-rank against the raw vectors — a
    * broadcast-hash fetch of |queries|·shortlist rows, never the
    * corpus. This is how PQ recall loss is bought back at 100 TB:
    * the expensive exact math runs on a candidate set whose size is
    * independent of corpus size.
    */
  def rerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, shortlist: Int, topK: Int, nSub: Int = 4,
      k: Int = 8, iters: Int = 1, sampleMod: Int = 2): DataFrame = {
    val cand = adcTopK(corpus, queries, idCol, vecCol, shortlist,
      nSub, k, iters, sampleMod).select(col("q_id"), col("n_id"))
    val c = corpus.select(col(idCol).cast("long").as("n_id"),
      col(vecCol).as("n_vec"))
      .withColumn("n_nrm", Similarity.norm(col("n_vec")))
    val q = queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("q_vec"))
      .withColumn("q_nrm", Similarity.norm(col("q_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    cand.join(c, "n_id").join(broadcast(q), "q_id")
      .withColumn("sim", round(
        Similarity.dot(col("q_vec"), col("n_vec"))
          / (col("q_nrm") * col("n_nrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
      .orderBy("q_id", "rank")
  }

  def simAnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    adcTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      topK = 5, nSub = 4, k = 8, iters = 1, sampleMod = 2)
  }

  def simPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    rerankTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
      "embedding", shortlist = 20, topK = 5)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_pq" -> simAnnPq _,
    "sim_pq_rerank" -> simPqRerank _)

  /** DuckDB replica: hash-sampled fit, rank-seeded init, one Lloyd
    * iteration, code assignment and ADC scoring — all comparisons in
    * the same integer micro-units. The CTE base through `approx` is
    * shared by the plain ADC query and the re-ranked variant.
    */
  private[operators] val oracleBase: String =
    """WITH ee AS (
        |  SELECT vec_id, (i - 1) // 16 AS m, (i - 1) % 16 AS j, x
        |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |          CAST(unnest(embedding) AS DOUBLE) AS x
        |        FROM embeddings)
        |), ef AS (
        |  SELECT * FROM ee WHERE
        |    ((strpos('0123456789abcdef',
        |        substr(md5('ivfs:' || vec_id), 1, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef',
        |        substr(md5('ivfs:' || vec_id), 2, 1)) - 1)) % 2 = 0
        |), seeds AS (
        |  SELECT vec_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
        |  FROM (SELECT DISTINCT vec_id FROM ef ORDER BY vec_id LIMIT 8)
        |), cent0 AS (
        |  SELECT e.m, s.cell, e.j, e.x AS v
        |  FROM seeds s JOIN ef e ON e.vec_id = s.vec_id
        |), d1 AS (
        |  SELECT f.vec_id, f.m, c.cell,
        |    CAST(ROUND(SUM((f.x - c.v) * (f.x - c.v)) * 1e6)
        |      AS BIGINT) AS dm
        |  FROM ef f JOIN cent0 c ON c.m = f.m AND c.j = f.j
        |  GROUP BY f.vec_id, f.m, c.cell
        |), asg1 AS (
        |  SELECT vec_id, m, cell FROM (
        |    SELECT vec_id, m, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |        ORDER BY dm, cell) AS rn
        |    FROM d1) z WHERE rn = 1
        |), cm1 AS (
        |  SELECT a.m, a.cell, e.j, ROUND(AVG(e.x), 6) AS v
        |  FROM asg1 a
        |  JOIN ef e ON e.vec_id = a.vec_id AND e.m = a.m
        |  GROUP BY a.m, a.cell, e.j
        |), cent1 AS (
        |  SELECT * FROM cm1
        |  UNION ALL
        |  SELECT p.m, p.cell, p.j, p.v FROM cent0 p
        |  WHERE NOT EXISTS (SELECT 1 FROM cm1 c
        |    WHERE c.m = p.m AND c.cell = p.cell)
        |), dall AS (
        |  SELECT e.vec_id, e.m, c.cell,
        |    CAST(ROUND(SUM((e.x - c.v) * (e.x - c.v)) * 1e6)
        |      AS BIGINT) AS dm
        |  FROM ee e JOIN cent1 c ON c.m = e.m AND c.j = e.j
        |  GROUP BY e.vec_id, e.m, c.cell
        |), codes AS (
        |  SELECT vec_id, m, cell FROM (
        |    SELECT vec_id, m, cell,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, m
        |        ORDER BY dm, cell) AS rn
        |    FROM dall) z WHERE rn = 1
        |), approx AS (
        |  SELECT qd.vec_id AS q_id, n.vec_id AS n_id,
        |    CAST(SUM(qd.dm) AS BIGINT) AS adist
        |  FROM codes n
        |  JOIN dall qd ON qd.m = n.m AND qd.cell = n.cell
        |    AND qd.vec_id < 8 AND qd.vec_id <> n.vec_id
        |  GROUP BY qd.vec_id, n.vec_id
        |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_ann_pq" -> (oracleBase +
      """, ranked AS (
        |  SELECT q_id, n_id, adist,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY adist, n_id) AS rank
        |  FROM approx)
        |SELECT q_id, n_id, adist, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin),
    "sim_pq_rerank" -> (oracleBase +
      """, shortlist AS (
        |  SELECT q_id, n_id FROM (
        |    SELECT q_id, n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q_id
        |        ORDER BY adist, n_id) AS rnk
        |    FROM approx) z WHERE rnk <= 20
        |), nrms AS (
        |  SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM ee
        |  GROUP BY vec_id
        |), dots AS (
        |  SELECT s.q_id, s.n_id, SUM(q.x * e.x) AS dot
        |  FROM shortlist s
        |  JOIN ee q ON q.vec_id = s.q_id
        |  JOIN ee e ON e.vec_id = s.n_id AND e.m = q.m AND e.j = q.j
        |  GROUP BY s.q_id, s.n_id
        |), cos AS (
        |  SELECT d.q_id, d.n_id,
        |    ROUND(d.dot / (nq.nrm * ne.nrm), 6) AS sim
        |  FROM dots d
        |  JOIN nrms nq ON nq.vec_id = d.q_id
        |  JOIN nrms ne ON ne.vec_id = d.n_id
        |), rr AS (
        |  SELECT q_id, n_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, n_id) AS rank
        |  FROM cos)
        |SELECT q_id, n_id, sim, CAST(rank AS INT) AS rank
        |FROM rr WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin))
}
