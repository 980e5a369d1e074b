package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF+PQ composite ANN — the production retrieval index shape
  * (SURVEY.md §7.5 similarity-search scale path; the structure FAISS
  * calls IVFADC): an IVF coarse quantizer routes every vector to a
  * cell, vectors are PQ-encoded on their RESIDUAL against the cell
  * centroid (residuals are far smaller in magnitude than raw vectors,
  * so the same one-byte codebook quantizes them much more finely),
  * and queries probe only their `nProbe` nearest cells with an ADC
  * lookup-table scan over the codes in those cells.
  *
  * Why this is the 100 TB shape, beyond what `sim_ann_ivf` and
  * `sim_ann_pq` each prove alone:
  *   - the scan cost per query is (corpus/nCells)·nProbe CODE rows —
  *     both factors are tunable, and the scanned payload is nSub bytes
  *     per vector, not the vector;
  *   - the corpus never shuffles: cell assignment, residual, and codes
  *     are one narrow codegen'd projection over driver-held literal
  *     centroids (the broadcast-variable analog);
  *   - the only joins are a broadcast of the (tiny) probe table and
  *     the final per-query top-k window.
  *
  * Cross-engine exactness: the coarse fit is `Similarity.fitCentArr`
  * (hash-sampled, round-6 means, cosine ties to lowest cell — the
  * quantizer `sim_ann_ivf` already proves hash-exact), and the PQ fit
  * is `Pq.fitCodebooksFromSample` on the residuals of the SAME hash
  * sample (micro-unit integer argmin, round-6 means). Every ADC
  * comparison happens in integer micro-units, so rank order is
  * partition-independent.
  */
object IvfPq {

  /** Driver-side replica of `Similarity.cellExpr`: argmax of
    * (round-6 cosine, -cell) over the fitted centroids. Used to
    * residualize the PQ fit sample with exactly the assignment the
    * corpus-side projection will compute. Comparison goes through
    * java.lang.Double.compare — the same total order Spark's struct
    * max uses (NaN above every double, NaN equal to NaN) — so a
    * zero-norm vector (all-NaN cosines) assigns to the lowest cell
    * exactly like cellExpr instead of NPE-ing out of the loop.
    * Per-centroid norms are hoisted (they are loop-invariant).
    */
  private def coarseAssign(v: Array[Double],
      cents: Array[(Long, Array[Double])],
      cnorms: Array[Double]): Array[Double] = {
    val nrm = Similarity.centNorm(v)
    var bestS = Double.NegativeInfinity
    var bestCell = Long.MaxValue
    var bestCv: Array[Double] = cents(0)._2
    var ci = 0
    while (ci < cents.length) {
      val (cell, cv) = cents(ci)
      var d = 0.0; var j = 0
      while (j < v.length) { d += v(j) * cv(j); j += 1 }
      val s = Similarity.round6(d / (nrm * cnorms(ci)))
      val cmp = java.lang.Double.compare(s, bestS)
      if (cmp > 0 || (cmp == 0 && cell < bestCell)) {
        bestS = s; bestCell = cell; bestCv = cv
      }
      ci += 1
    }
    bestCv
  }

  /** The fitted quantizers: coarse IVF centroids + per-subspace
    * residual PQ codebooks. Bounded by nCells + nSub·kPq·dims — tiny
    * by construction (the broadcast-variable analog), and persistable
    * as two small parquet tables via save/load below.
    */
  case class Index(cents: Array[(Long, Array[Double])],
      books: Array[Array[Array[Double]]]) {
    def subDim: Int = books(0)(0).length
    def nSub: Int = books.length
  }

  /** Fit the coarse quantizer and the residual PQ codebooks on the
    * md5 hash sample — identical contracts to sim_ann_ivf / sim_ann_pq.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      nCells: Int, coarseIters: Int, nSub: Int = 4, kPq: Int = 8,
      pqIters: Int = 1, sampleMod: Int = 2): Index = {
    // ONE corpus scan + collect feeds both quantizer fits
    val sample = Similarity.fitSample(corpus, idCol, vecCol, sampleMod)
    require(sample.nonEmpty,
      s"IVFPQ fit: hash sample (mod $sampleMod) kept no vectors")
    val cents = Similarity.fitCentArrOnSample(sample, nCells,
      coarseIters)
    val cnorms = cents.map { case (_, cv) => Similarity.centNorm(cv) }
    val residSample = sample.map { case (id, v) =>
      val cv = coarseAssign(v, cents, cnorms)
      val r = new Array[Double](v.length)
      var j = 0
      while (j < v.length) { r(j) = v(j) - cv(j); j += 1 }
      (id, r)
    }
    Index(cents,
      Pq.fitCodebooksFromSample(residSample, nSub, kPq, pqIters))
  }

  private def vD(c: Column): Column = transform(c, x => x.cast("double"))

  private def subSlice(idx: Index, res: Column, m: Int): Column =
    slice(res, m * idx.subDim + 1, idx.subDim)

  /** The one centroid literal both sides share: (cell, cv, norm)
    * structs. Carrying cv through the argmax/explode means the plan
    * holds a SINGLE copy of the centroid table (a second map literal
    * for the residual lookup would double codegen/literal size —
    * the exact trap the cellExpr comment documents).
    */
  private def centsLit(idx: Index): Column =
    typedlit(idx.cents.toSeq.map { case (cell, cv) =>
      (cell, cv.toSeq, Similarity.centNorm(cv))
    })

  /** Argmax by (round-6 cosine, -cell) returning the winning struct —
    * same ordering key as `Similarity.cellExpr` (cell is unique, so
    * the trailing cv field never participates in comparisons).
    */
  private def bestCellStruct(vec: Column, nrmD: Column,
      idx: Index): Column =
    array_max(transform(centsLit(idx), c => struct(
      round(Similarity.dotD(vec, c.getField("_2"))
        / (nrmD * c.getField("_3")), 6).as("s"),
      (-c.getField("_1")).as("nc"),
      c.getField("_1").as("c"),
      c.getField("_2").as("cv"))))

  /** Corpus side: cell -> residual -> one-byte codes, a single narrow
    * projection over the literal quantizers. The output (n_id, cell,
    * code_0..code_{nSub-1}) IS the persistent ANN index table — write
    * it partitioned/sorted by cell and probes prune to nProbe cells.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      idx: Index): DataFrame = {
    def codeExpr(res: Column, m: Int): Column =
      array_min(array(idx.books(m).zipWithIndex.map {
        case (cv, cidx) =>
          struct(Pq.microExpr(subSlice(idx, res, m), cv.toSeq)
            .as("dm"), lit(cidx).as("c"))
      }: _*)).getField("c")
    corpus
      .select(col(idCol).cast("long").as("n_id"),
        vD(col(vecCol)).as("v"))
      .withColumn("__nrm_d", Similarity.normD(col("v")))
      .withColumn("best", bestCellStruct(col("v"), col("__nrm_d"), idx))
      .withColumn("cell", col("best.c"))
      .withColumn("res",
        zip_with(col("v"), col("best.cv"), (x, c) => x - c))
      .select(col("n_id") +: col("cell") +:
        (0 until idx.nSub).map(m =>
          codeExpr(col("res"), m).as(s"code_$m")): _*)
  }

  /** Probe an encoded corpus: nProbe nearest cells per query, ADC
    * lookup tables on the query residuals, equi-join on cell id.
    * `queries` must be small (the probe table is broadcast).
    */
  def probe(coded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, idx: Index, topK: Int, nProbe: Int): DataFrame = {
    val probes = queries
      .select(col(idCol).cast("long").as("q_id"),
        vD(col(vecCol)).as("qv"))
      .withColumn("__qnrm", Similarity.normD(col("qv")))
      .select(col("q_id"), col("qv"),
        explode(transform(centsLit(idx), c => struct(
          c.getField("_1").as("cell"),
          round(Similarity.dotD(col("qv"), c.getField("_2"))
            / (col("__qnrm") * c.getField("_3")), 6).as("sim"),
          c.getField("_2").as("cv"))))
          .as("pc"))
      .select(col("q_id"), col("qv"), col("pc.cell").as("cell"),
        col("pc.sim").as("sim"), col("pc.cv").as("cv"))
      .withColumn("rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("sim").desc, col("cell"))))
      .filter(col("rn") <= nProbe)
      .withColumn("qres",
        zip_with(col("qv"), col("cv"), (x, c) => x - c))
      .select(col("q_id") +: col("cell") +:
        (0 until idx.nSub).map(m =>
          array(idx.books(m).map(cv =>
            Pq.microExpr(subSlice(idx, col("qres"), m), cv.toSeq)): _*)
            .as(s"qd_$m")): _*)
    val adist = (0 until idx.nSub).map(m =>
      element_at(col(s"qd_$m"), col(s"code_$m") + 1)).reduce(_ + _)
    val w = Window.partitionBy("q_id")
      .orderBy(col("adist"), col("n_id"))
    coded.join(broadcast(probes), Seq("cell"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("adist", adist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("n_id"), col("cell"), col("adist"),
        col("rank"))
      .orderBy("q_id", "rank")
  }

  /** Persist the fitted quantizers as two small parquet tables
    * (centroids: cell -> cv; codebooks: (m, cell) -> cv). The encoded
    * corpus saves separately via plain `coded.write` — together they
    * are the build-once/probe-many index layout.
    */
  def saveIndex(idx: Index, path: String): Unit = {
    val spark = SparkSession.active
    import spark.implicits._
    idx.cents.toSeq.map { case (c, cv) => (c, cv.toSeq) }
      .toDF("cell", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    idx.books.zipWithIndex.flatMap { case (cells, m) =>
      cells.zipWithIndex.map { case (cv, c) => (m, c, cv.toSeq) }
    }.toSeq.toDF("m", "cell", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebooks")
  }

  def loadIndex(spark: SparkSession, path: String): Index = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray)).sortBy(_._1)
    val rows = spark.read.parquet(s"$path/codebooks")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toArray))
    val nSub = rows.map(_._1).max + 1
    val books = Array.tabulate(nSub) { m =>
      rows.filter(_._1 == m).sortBy(_._2).map(_._3)
    }
    Index(cents, books)
  }

  /** ADC top-k over an IVF-routed, residual-PQ-coded corpus —
    * fit + encode + probe in one call (the catalog query path).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, topK: Int, nCells: Int, coarseIters: Int,
      nProbe: Int, nSub: Int = 4, kPq: Int = 8, pqIters: Int = 1,
      sampleMod: Int = 2): DataFrame = {
    val idx = fit(corpus, idCol, vecCol, nCells, coarseIters, nSub,
      kPq, pqIters, sampleMod)
    probe(encode(corpus, idCol, vecCol, idx), queries, idCol, vecCol,
      idx, topK, nProbe)
  }

  def simAnnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    ivfPqTopK(emb, emb.filter(col("vec_id") < 8), "vec_id",
      "embedding", topK = 5, nCells = 16, coarseIters = 2, nProbe = 2,
      nSub = 4, kPq = 8, pqIters = 1, sampleMod = 2)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_ann_ivfpq" -> simAnnIvfPq _)

  /** DuckDB replica: the shared IVF fit/assign prefix (identical to
    * sim_ann_ivf's oracle), residualization against the assigned
    * cell's final centroid, PQ fit replay on the sampled residuals,
    * whole-corpus encoding, nProbe=2 probe selection, ADC scoring —
    * every comparison in the same integer micro-units.
    */
  val oracle: Map[String, String] = Map(
    "sim_ann_ivfpq" -> (ExtQueries.ivfFitAssignSql(16, 2, 2, mat = true) + """, res AS MATERIALIZED (
  SELECT e.vec_id, e.i, e.x - c.m AS x
  FROM ee e
  JOIN assign a ON a.vec_id = e.vec_id
  JOIN cent2 c ON c.cell = a.cell AND c.i = e.i
), rsub AS MATERIALIZED (
  SELECT vec_id, (i - 1) // 16 AS m, (i - 1) % 16 AS j, x FROM res
), rf AS MATERIALIZED (
  SELECT r.* FROM rsub r
  WHERE r.vec_id IN (SELECT DISTINCT vec_id FROM ef)
), pseeds AS MATERIALIZED (
  SELECT vec_id,
    CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
  FROM (SELECT DISTINCT vec_id FROM rf ORDER BY vec_id LIMIT 8)
), pcent0 AS MATERIALIZED (
  SELECT r.m, s.cell, r.j, r.x AS v
  FROM pseeds s JOIN rf r ON r.vec_id = s.vec_id
), pd1 AS MATERIALIZED (
  SELECT f.vec_id, f.m, c.cell,
    CAST(ROUND(SUM((f.x - c.v) * (f.x - c.v)) * 1e6) AS BIGINT) AS dm
  FROM rf f JOIN pcent0 c ON c.m = f.m AND c.j = f.j
  GROUP BY f.vec_id, f.m, c.cell
), pasg1 AS MATERIALIZED (
  SELECT vec_id, m, cell FROM (
    SELECT vec_id, m, cell,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m
        ORDER BY dm, cell) AS rn
    FROM pd1) z WHERE rn = 1
), pcm1 AS MATERIALIZED (
  SELECT a.m, a.cell, r.j, ROUND(AVG(r.x), 6) AS v
  FROM pasg1 a JOIN rf r ON r.vec_id = a.vec_id AND r.m = a.m
  GROUP BY a.m, a.cell, r.j
), pcent1 AS MATERIALIZED (
  SELECT * FROM pcm1
  UNION ALL
  SELECT p.m, p.cell, p.j, p.v FROM pcent0 p
  WHERE NOT EXISTS (SELECT 1 FROM pcm1 c
    WHERE c.m = p.m AND c.cell = p.cell)
), pdall AS MATERIALIZED (
  SELECT r.vec_id, r.m, c.cell,
    CAST(ROUND(SUM((r.x - c.v) * (r.x - c.v)) * 1e6) AS BIGINT) AS dm
  FROM rsub r JOIN pcent1 c ON c.m = r.m AND c.j = r.j
  GROUP BY r.vec_id, r.m, c.cell
), codes AS MATERIALIZED (
  SELECT vec_id, m, cell FROM (
    SELECT vec_id, m, cell,
      ROW_NUMBER() OVER (PARTITION BY vec_id, m
        ORDER BY dm, cell) AS rn
    FROM pdall) z WHERE rn = 1
), probes AS MATERIALIZED (
  SELECT vec_id AS q_id, cell FROM (
    SELECT d.vec_id, d.cell,
      ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
        ROUND(d.dot / (nv.nrm * cc.cnrm), 6) DESC, d.cell) AS rn
    FROM cdF d
    JOIN norms nv ON nv.vec_id = d.vec_id
    JOIN cnF cc ON cc.cell = d.cell
    WHERE d.vec_id < 8) z
  WHERE rn <= 2
), qres AS MATERIALIZED (
  SELECT p.q_id, p.cell, (e.i - 1) // 16 AS m, (e.i - 1) % 16 AS j,
    e.x - c.m AS x
  FROM probes p
  JOIN ee e ON e.vec_id = p.q_id
  JOIN cent2 c ON c.cell = p.cell AND c.i = e.i
), qd AS MATERIALIZED (
  SELECT q.q_id, q.cell, q.m, pc.cell AS pcell,
    CAST(ROUND(SUM((q.x - pc.v) * (q.x - pc.v)) * 1e6) AS BIGINT) AS dm
  FROM qres q JOIN pcent1 pc ON pc.m = q.m AND pc.j = q.j
  GROUP BY q.q_id, q.cell, q.m, pc.cell
), approx AS MATERIALIZED (
  SELECT qd.q_id, n.vec_id AS n_id, a.cell,
    CAST(SUM(qd.dm) AS BIGINT) AS adist
  FROM codes n
  JOIN assign a ON a.vec_id = n.vec_id
  JOIN qd ON qd.cell = a.cell AND qd.m = n.m AND qd.pcell = n.cell
  WHERE n.vec_id <> qd.q_id
  GROUP BY qd.q_id, n.vec_id, a.cell
), ranked AS MATERIALIZED (
  SELECT q_id, n_id, cell, adist,
    ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY adist, n_id) AS rank
  FROM approx)
SELECT q_id, n_id, cell, adist, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank"""))
}
