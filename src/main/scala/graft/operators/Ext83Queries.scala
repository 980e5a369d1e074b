package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 batch B — three more uncovered operators:
  *
  *  - `sketch_countsketch`: the signed Count-Sketch frequency
  *    estimator (median-of-rows, ±1 hashing) next to its exact
  *    counts — the unbiased cousin of the `sketch_cms` min-estimator,
  *    and the sketch an L2/heavy-hitter pipeline actually merges.
  *  - `ts_spectral_peak`: Goertzel/DFT power of the hourly
  *    event-value series at candidate periods (6h/12h/24h/weekly) —
  *    the direct spectral seasonality probe next to
  *    `ts_seasonality_strength`'s variance-ratio method.
  *  - `embed_corr_pairs`: strongest off-diagonal dimension
  *    correlations of the embedding matrix — the redundancy audit
  *    that motivates whitening/PCA, beyond `embed_dim_energy`'s
  *    marginal (per-dim) energies.
  */
object Ext83Queries {

  // ---------------------------------------------------------------
  // sketch_countsketch
  // ---------------------------------------------------------------

  /** Count-Sketch over supplier lineitem frequencies: 3 rows × 64
    * buckets, bucket by the `sketch_cms` md5 convention, sign by the
    * even-first-hex convention (Similarity's hyperplane rule). Each
    * cell is Σ±1 over the stream; the estimate for a key is the
    * MEDIAN over rows of sign·cell — unbiased where CMS only
    * over-counts. Reported for the 10 most frequent suppliers next
    * to their exact counts, err = est − exact.
    *
    * 100 TB shape: the sketch is 3 unioned codegen'd
    * scan→hash→partial-agg pipelines collapsing to 192 cells (the
    * sketch_cms shape, one more md5 for the sign); the probe side
    * joins the |suppliers|-bounded exact table to the 192-cell
    * broadcast; top-10 is TakeOrdered, never a global sort.
    */
  def countSketch(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem").select(col("l_suppkey"))
    def bucket(r: Int, k: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws(":", lit(r), k)), 1, 4), 16, 10)
        .cast("long") % 64
    def sign(r: Int, k: org.apache.spark.sql.Column) =
      when(substring(md5(concat_ws(":", lit("s"), lit(r), k)), 1, 1)
        .isin("0", "2", "4", "6", "8", "a", "c", "e"), 1L)
        .otherwise(-1L)
    val cells = (0 until 3).map { r =>
      li.select(lit(r).as("sketch_row"),
        bucket(r, col("l_suppkey")).as("bucket"),
        sign(r, col("l_suppkey")).as("s"))
    }.reduce(_ unionAll _)
      .groupBy("sketch_row", "bucket").agg(sum("s").as("cell"))
    val exact = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("f_exact"))
    // probe side: ONE exact aggregate exploded over the 3 rows (the
    // union-of-scans trick only pays on the corpus-sized cell side)
    def bucketC(r: org.apache.spark.sql.Column,
        k: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws(":", r, k)), 1, 4), 16, 10)
        .cast("long") % 64
    def signC(r: org.apache.spark.sql.Column,
        k: org.apache.spark.sql.Column) =
      when(substring(md5(concat_ws(":", lit("s"), r, k)), 1, 1)
        .isin("0", "2", "4", "6", "8", "a", "c", "e"), 1L)
        .otherwise(-1L)
    val probes = exact
      .withColumn("sketch_row",
        explode(array(lit(0), lit(1), lit(2))))
      .withColumn("bucket",
        bucketC(col("sketch_row"), col("l_suppkey")))
      .withColumn("s", signC(col("sketch_row"), col("l_suppkey")))
      .join(broadcast(cells), Seq("sketch_row", "bucket"))
      .withColumn("e", col("s") * col("cell"))
      .groupBy("l_suppkey", "f_exact")
      .agg(sum(when(col("sketch_row") === 0, col("e"))).as("e0"),
        sum(when(col("sketch_row") === 1, col("e"))).as("e1"),
        sum(when(col("sketch_row") === 2, col("e"))).as("e2"))
      .withColumn("est", expr(
        "e0 + e1 + e2 - greatest(e0, e1, e2) - least(e0, e1, e2)"))
    probes
      .select(col("l_suppkey"), col("f_exact"), col("est"),
        (col("est") - col("f_exact")).as("err"))
      .orderBy(col("f_exact").desc, col("l_suppkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------
  // ts_spectral_peak
  // ---------------------------------------------------------------

  /** Spectral seasonality probe: DFT amplitude of the hourly
    * event-value series at the four candidate periods a daily/weekly
    * business signal shows (6h, 12h, 24h, 168h). Phase-invariant, so
    * absolute epoch-hours work directly: the angle uses hr MOD period
    * (exact integer both engines), and each cos/sin is quantized
    * ONCE to the micro lattice — the quantized trig table is
    * data-independent (210 fixed entries), so engine parity of the
    * whole query reduces to parity of that fixed table (proven by
    * the oracle gate at any one SF). Σ v·cos and Σ v·sin are then
    * exact-integer; only the final amplitude takes IEEE sqrt.
    *
    * 100 TB shape: the corpus collapses to the |hours|-bounded hourly
    * table first; the 4-row period spine is a broadcast; everything
    * after is arithmetic on ≤ 4·|hours| rows.
    */
  def spectralPeak(spark: SparkSession, dir: String): DataFrame = {
    val hourly = t(spark, dir, "events")
      .select(expr("ts div 3600000000000").as("hr"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("hr").agg(sum("vm").as("v"))
    val spine = broadcast(
      hourly.sparkSession.range(1).select(
        explode(array(lit(6L), lit(12L), lit(24L), lit(168L)))
          .as("period")))
    hourly.crossJoin(spine)
      .withColumn("m", expr("hr % period"))
      .withColumn("cq",
        round(cos(lit(2 * math.Pi) * col("m") / col("period")) * 1e6)
          .cast("long"))
      .withColumn("sq",
        round(sin(lit(2 * math.Pi) * col("m") / col("period")) * 1e6)
          .cast("long"))
      .groupBy("period")
      .agg(count(lit(1)).as("n_hours"),
        sum(expr("v * cq")).as("c_sum"),
        sum(expr("v * sq")).as("s_sum"))
      .withColumn("amp", expr(
        "cast(round(sqrt(cast(c_sum as double) * cast(c_sum as double)" +
          " + cast(s_sum as double) * cast(s_sum as double)) / 1e6)" +
          " as bigint)"))
      .select("period", "n_hours", "c_sum", "s_sum", "amp")
      .orderBy("period")
  }

  // ---------------------------------------------------------------
  // embed_corr_pairs
  // ---------------------------------------------------------------

  /** Top-20 most correlated dimension pairs of the embedding matrix
    * (by |Pearson r|): per-vector dimension pairs (i < j) aggregate
    * exact integer moments on the milli lattice (embed_dim_energy's
    * quantization), and r = (nΣxy − ΣxΣy) / √((nΣx²−(Σx)²)(nΣy²−(Σy)²))
    * divides once, as one fixed IEEE expression, onto the micro
    * lattice. Highly-correlated dimension pairs are exactly the
    * redundancy whitening/PCA removes — the audit that says whether
    * either is worth running.
    *
    * 100 TB shape: the pair explosion is O(vectors·d²/2) with d
    * fixed at 64 — linear in the corpus — aggregated in one hash agg
    * to the C(64,2)=2016-row pair lattice; marginal moments join in
    * as a 64-row broadcast; top-20 is TakeOrdered on 2016 rows.
    */
  def corrPairs(spark: SparkSession, dir: String): DataFrame = {
    // cache(), round 12: the exploded element list feeds THREE
    // consumers (marginal moments + both self-join sides) — uncached,
    // each re-ran the explode+quantize scan (plan showed 3 scans).
    // |corpus|·64 narrow rows, plan-keyed, released by the harness'
    // between-query clearCache.
    val el = t(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding"))
        .as(Seq("pos", "x")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim"),
        expr("cast(round(x * 1000) as bigint)").as("xm"))
      .cache()
    val marg = el.groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("xm").as("s1"),
        sum(expr("xm * xm")).as("s2"))
    val a = el.select(col("vec_id"), col("dim").as("di"),
      col("xm").as("xi"))
    val b = el.select(col("vec_id"), col("dim").as("dj"),
      col("xm").as("xj"))
    val pairs = a.join(b, Seq("vec_id")).filter(col("di") < col("dj"))
      .groupBy("di", "dj").agg(sum(expr("xi * xj")).as("sxy"))
    pairs
      .join(broadcast(marg.select(col("dim").as("di"),
        col("n"), col("s1").as("s1i"), col("s2").as("s2i"))), "di")
      .join(broadcast(marg.select(col("dim").as("dj"),
        col("s1").as("s1j"), col("s2").as("s2j"))), "dj")
      .withColumn("corr_micro", expr(
        "cast(round((cast(n as double) * cast(sxy as double)" +
          " - cast(s1i as double) * cast(s1j as double))" +
          " / sqrt((cast(n as double) * cast(s2i as double)" +
          " - cast(s1i as double) * cast(s1i as double))" +
          " * (cast(n as double) * cast(s2j as double)" +
          " - cast(s1j as double) * cast(s1j as double))) * 1e6)" +
          " as bigint)"))
      .select(col("di"), col("dj"), col("sxy"), col("corr_micro"))
      .orderBy(abs(col("corr_micro")).desc, col("di"), col("dj"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_countsketch" -> countSketch _,
    "ts_spectral_peak" -> spectralPeak _,
    "embed_corr_pairs" -> corrPairs _,
  )

  val oracle: Map[String, String] = Map(
    "sketch_countsketch" ->
      """WITH li AS (
        |  SELECT l_suppkey FROM lineitem
        |), hashed AS (
        |  SELECT l_suppkey, r.r AS sketch_row,
        |    CAST((
        |      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)
        |    ) % 64 AS BIGINT) AS bucket,
        |    CASE WHEN substr(hs, 1, 1) IN
        |      ('0','2','4','6','8','a','c','e')
        |      THEN 1 ELSE -1 END AS s
        |  FROM li,
        |    UNNEST(range(0, 3)) AS r(r),
        |    LATERAL (SELECT md5(r.r || ':' || l_suppkey) AS h,
        |      md5('s' || ':' || r.r || ':' || l_suppkey) AS hs) mh
        |), cells AS (
        |  SELECT sketch_row, bucket, CAST(SUM(s) AS BIGINT) AS cell
        |  FROM hashed GROUP BY sketch_row, bucket
        |), exact AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS f_exact
        |  FROM li GROUP BY l_suppkey
        |), probes AS (
        |  SELECT DISTINCT l_suppkey, sketch_row, bucket, s FROM hashed
        |), est AS (
        |  SELECT e.l_suppkey, e.f_exact,
        |    SUM(CASE WHEN p.sketch_row = 0
        |      THEN p.s * c.cell END) AS e0,
        |    SUM(CASE WHEN p.sketch_row = 1
        |      THEN p.s * c.cell END) AS e1,
        |    SUM(CASE WHEN p.sketch_row = 2
        |      THEN p.s * c.cell END) AS e2
        |  FROM exact e
        |  JOIN probes p ON p.l_suppkey = e.l_suppkey
        |  JOIN cells c ON c.sketch_row = p.sketch_row
        |    AND c.bucket = p.bucket
        |  GROUP BY e.l_suppkey, e.f_exact)
        |SELECT l_suppkey, f_exact,
        |  CAST(e0 + e1 + e2 - GREATEST(e0, e1, e2)
        |    - LEAST(e0, e1, e2) AS BIGINT) AS est,
        |  CAST(e0 + e1 + e2 - GREATEST(e0, e1, e2)
        |    - LEAST(e0, e1, e2) - f_exact AS BIGINT) AS err
        |FROM est
        |ORDER BY f_exact DESC, l_suppkey
        |LIMIT 10""".stripMargin,
    "ts_spectral_peak" ->
      """WITH hourly AS (
        |  SELECT epoch_us(ts) // 3600000000 AS hr,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM events GROUP BY 1
        |), terms AS (
        |  SELECT p.period, h.v,
        |    CAST(ROUND(cos(2 * pi() * (h.hr % p.period) / p.period)
        |      * 1e6) AS BIGINT) AS cq,
        |    CAST(ROUND(sin(2 * pi() * (h.hr % p.period) / p.period)
        |      * 1e6) AS BIGINT) AS sq
        |  FROM hourly h
        |  CROSS JOIN (SELECT UNNEST([6, 12, 24, 168]) AS period) p
        |), agg AS (
        |  SELECT CAST(period AS BIGINT) AS period,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours,
        |    CAST(SUM(v * cq) AS BIGINT) AS c_sum,
        |    CAST(SUM(v * sq) AS BIGINT) AS s_sum
        |  FROM terms GROUP BY period)
        |SELECT period, n_hours, c_sum, s_sum,
        |  CAST(ROUND(sqrt(CAST(c_sum AS DOUBLE) * CAST(c_sum AS DOUBLE)
        |    + CAST(s_sum AS DOUBLE) * CAST(s_sum AS DOUBLE)) / 1e6)
        |    AS BIGINT) AS amp
        |FROM agg
        |ORDER BY period""".stripMargin,
    "embed_corr_pairs" ->
      """WITH el AS (
        |  SELECT vec_id, CAST(generate_subscripts(embedding, 1)
        |      AS BIGINT) AS dim,
        |    CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000)
        |      AS BIGINT) AS xm
        |  FROM embeddings
        |), marg AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(xm) AS BIGINT) AS s1,
        |    CAST(SUM(xm * xm) AS BIGINT) AS s2
        |  FROM el GROUP BY dim
        |), pairs AS (
        |  SELECT a.dim AS di, b.dim AS dj,
        |    CAST(SUM(a.xm * b.xm) AS BIGINT) AS sxy
        |  FROM el a JOIN el b ON a.vec_id = b.vec_id
        |    AND a.dim < b.dim
        |  GROUP BY a.dim, b.dim)
        |SELECT p.di, p.dj, p.sxy,
        |  CAST(ROUND((CAST(mi.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
        |    - CAST(mi.s1 AS DOUBLE) * CAST(mj.s1 AS DOUBLE))
        |    / sqrt((CAST(mi.n AS DOUBLE) * CAST(mi.s2 AS DOUBLE)
        |      - CAST(mi.s1 AS DOUBLE) * CAST(mi.s1 AS DOUBLE))
        |      * (CAST(mi.n AS DOUBLE) * CAST(mj.s2 AS DOUBLE)
        |        - CAST(mj.s1 AS DOUBLE) * CAST(mj.s1 AS DOUBLE)))
        |    * 1e6) AS BIGINT) AS corr_micro
        |FROM pairs p
        |JOIN marg mi ON mi.dim = p.di
        |JOIN marg mj ON mj.dim = p.dj
        |ORDER BY abs(corr_micro) DESC, p.di, p.dj
        |LIMIT 20""".stripMargin,
  )
}
