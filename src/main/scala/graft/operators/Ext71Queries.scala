package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 batch 6b: per-subpopulation embedding drift.
  *
  *  - `embed_lang_drift`: cosine between each language's embedding
  *    centroid and the global centroid — the subpopulation-drift check
  *    a curation pipeline runs before mixing corpora (a language whose
  *    centroid points away from the corpus mean embeds differently:
  *    encoder mismatch, contamination, or genuine distribution shift).
  *    Centroids are exact integer lattices: per-dimension floor means
  *    of round(x·1e6), signed pmod-floor division, so both engines fit
  *    the identical centroid; only the final cosine rounds (the proven
  *    round-6 contract).
  *
  * 100 TB shape: one |vectors|·64 explode aggregated to |langs|·64
  * centroid cells (map-side combine does the heavy lifting), the
  * global centroid joins dimension-equi — no pairwise anything.
  */
object Ext71Queries {

  def langDrift(spark: SparkSession, dir: String): DataFrame = {
    val xm = t(spark, dir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"),
        posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i").cast("long").as("i"),
        expr("cast(round(x * 1000000) as bigint)").as("xm"))
      .join(t(spark, dir, "documents")
        .select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
    // signed floor means: xm can be negative, so the pmod-floor
    // identity keeps Spark div == DuckDB //
    def floorMean = expr(
      "(sum(xm) - pmod(pmod(sum(xm), count(*)) + count(*), count(*)))" +
        " div count(*)")
    val byLang = xm.groupBy("lang", "i").agg(floorMean.as("cm"))
    val global = xm.groupBy("i").agg(floorMean.as("gm"))
    val nVecs = xm.select("lang", "vec_id").distinct()
      .groupBy("lang").agg(count(lit(1)).as("n_vecs"))
    byLang.join(global, Seq("i"))
      .groupBy("lang")
      .agg(sum(col("cm") * col("gm")).as("dot"),
        sqrt(sum(col("cm") * col("cm"))).as("nl"),
        sqrt(sum(col("gm") * col("gm"))).as("ng"))
      .join(nVecs, Seq("lang"))
      .select(col("lang"), col("n_vecs"),
        (round(round(col("dot") / (col("nl") * col("ng")), 6) * 1e6, 0))
          .cast("long").as("cos_micro"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_lang_drift" -> langDrift _,
  )

  val oracle: Map[String, String] = Map(
    "embed_lang_drift" ->
      """WITH xm AS (
        |  SELECT e.vec_id, d.lang,
        |    generate_subscripts(e.embedding, 1) - 1 AS i,
        |    CAST(round(CAST(unnest(e.embedding) AS DOUBLE) * 1000000)
        |      AS BIGINT) AS xm
        |  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        |), bylang AS (
        |  SELECT lang, i,
        |    CAST((SUM(xm) - ((SUM(xm) % count(*)) + count(*))
        |      % count(*)) // count(*) AS BIGINT) AS cm
        |  FROM xm GROUP BY 1, 2
        |), gcent AS (
        |  SELECT i,
        |    CAST((SUM(xm) - ((SUM(xm) % count(*)) + count(*))
        |      % count(*)) // count(*) AS BIGINT) AS gm
        |  FROM xm GROUP BY 1
        |), nv AS (
        |  SELECT lang, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs
        |  FROM xm GROUP BY 1
        |), cos AS (
        |  SELECT b.lang, SUM(b.cm * g.gm) AS dot,
        |    sqrt(SUM(b.cm * b.cm)) AS nl, sqrt(SUM(g.gm * g.gm)) AS ng
        |  FROM bylang b JOIN gcent g ON g.i = b.i
        |  GROUP BY 1
        |)
        |SELECT c.lang, n.n_vecs,
        |  CAST(round(round(c.dot / (c.nl * c.ng), 6) * 1e6, 0)
        |    AS BIGINT) AS cos_micro
        |FROM cos c JOIN nv n ON n.lang = c.lang
        |ORDER BY c.lang""".stripMargin,
  )
}
