package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 24: HITS hubs/authorities and RAKE keyphrases.
  *
  *  - `graph_hits2`: Kleinberg's HITS on the supplier→part supply
  *    graph, two unnormalized iterations — hubs are suppliers whose
  *    parts are widely supplied, authorities the parts carried by
  *    strong hubs. Unnormalized keeps every score an exact walk
  *    count (h2 = A·Aᵀ·A·1), the same integer discipline as
  *    `graph_katz3`; top-20 per role with total-order tiebreaks.
  *  - `text_rake_phrases`: RAKE keyphrase extraction — candidate
  *    phrases are maximal stopword-free token runs (gaps-and-islands
  *    on token positions), word scores deg/freq in micro units
  *    (degree = Σ length of containing phrase occurrences), phrase
  *    score the sum of member word scores. The phrase-level
  *    complement of `text_textrank_keywords`' word graph.
  *
  * 100 TB shapes: HITS is two |E| hash joins over the deduped edge
  * list; RAKE is one window to label runs, two hash aggregates
  * (word stats, phrase stats), and a bounded top-k — no joins wider
  * than the corpus token count.
  */
object Ext61Queries {

  // ---------------------------------------------------------------
  // graph_hits2
  // ---------------------------------------------------------------

  def hits2(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "lineitem")
      .select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .distinct().cache()
    val h1 = edges.groupBy("s").agg(count(lit(1)).as("h")) // A·1
    val a1 = edges.join(h1, "s")
      .groupBy("p").agg(sum("h").as("a")) // Aᵀ·h1
    val h2 = edges.join(a1, "p")
      .groupBy("s").agg(sum("a").as("h")) // A·a1
    val topHubs = h2.orderBy(col("h").desc, col("s")).limit(20)
      .select(lit("hub").as("role"), col("s").as("id"),
        col("h").as("score"))
    val topAuth = a1.orderBy(col("a").desc, col("p")).limit(20)
      .select(lit("auth").as("role"), col("p").as("id"),
        col("a").as("score"))
    topHubs.unionByName(topAuth).orderBy("role", "id")
  }

  // ---------------------------------------------------------------
  // text_rake_phrases
  // ---------------------------------------------------------------

  def rakePhrases(spark: SparkSession, dir: String): DataFrame = {
    val stop = TextAnalysis.enStopwords
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        lower(col("col")).as("w"))
      .filter(!col("w").isInCollection(stop))
    val wD = Window.partitionBy("doc_id").orderBy("pos")
    val runs = tok
      .withColumn("grp", col("pos") - row_number().over(wD))
      .cache()
    // phrase occurrences with their member words
    val occ = runs.groupBy("doc_id", "grp")
      .agg(count(lit(1)).as("plen"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("phrase"))
    val wordStats = runs
      .join(occ.select(col("doc_id"), col("grp"), col("plen")),
        Seq("doc_id", "grp"))
      .groupBy("w")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .withColumn("wscore_micro", expr("deg * 1000000 div freq"))
    val phraseScore = runs
      .join(wordStats.select("w", "wscore_micro"), "w")
      .groupBy("doc_id", "grp")
      .agg(sum("wscore_micro").as("pscore_micro"))
    occ.join(phraseScore, Seq("doc_id", "grp"))
      .filter(col("plen") >= 2)
      .groupBy("phrase")
      .agg(count(lit(1)).as("n_occ"), max("pscore_micro").as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase"))
      .limit(30)
      .select("phrase", "n_occ", "score_micro")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_hits2" -> hits2 _,
    "text_rake_phrases" -> rakePhrases _,
  )

  private val stopList = TextAnalysis.enStopwords
    .map(w => s"'$w'").mkString(", ")

  val oracle: Map[String, String] = Map(
    "graph_hits2" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_suppkey AS s, l_partkey AS p
        |  FROM lineitem
        |), h1 AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS h
        |  FROM edges GROUP BY s
        |), a1 AS (
        |  SELECT e.p, CAST(SUM(h1.h) AS BIGINT) AS a
        |  FROM edges e JOIN h1 ON h1.s = e.s GROUP BY e.p
        |), h2 AS (
        |  SELECT e.s, CAST(SUM(a1.a) AS BIGINT) AS h
        |  FROM edges e JOIN a1 ON a1.p = e.p GROUP BY e.s
        |), tops AS (
        |  SELECT 'hub' AS role, s AS id, h AS score
        |  FROM (SELECT s, h FROM h2 ORDER BY h DESC, s LIMIT 20)
        |  UNION ALL
        |  SELECT 'auth', p, a
        |  FROM (SELECT p, a FROM a1 ORDER BY a DESC, p LIMIT 20)
        |)
        |SELECT role, id, score FROM tops ORDER BY role, id""".stripMargin,
    "text_rake_phrases" ->
      s"""WITH tok0 AS (
        |  SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos, lower(tk[i]) AS w
        |  FROM (SELECT doc_id,
        |          string_split_regex(trim(text), '\\s+') AS tk
        |        FROM documents),
        |    UNNEST(range(1, len(tk) + 1)) AS r(i)
        |), tok AS (
        |  SELECT * FROM tok0 WHERE w NOT IN ($stopList)
        |), runs AS (
        |  SELECT doc_id, pos, w,
        |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY pos) AS grp
        |  FROM tok
        |), occ AS (
        |  SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS plen,
        |    string_agg(w, ' ' ORDER BY pos) AS phrase
        |  FROM runs GROUP BY doc_id, grp
        |), ws AS (
        |  SELECT r.w, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(SUM(o.plen) AS BIGINT) AS deg
        |  FROM runs r JOIN occ o ON o.doc_id = r.doc_id
        |    AND o.grp = r.grp
        |  GROUP BY r.w
        |), wsc AS (
        |  SELECT w, CAST(deg * 1000000 // freq AS BIGINT)
        |    AS wscore_micro
        |  FROM ws
        |), ps AS (
        |  SELECT r.doc_id, r.grp,
        |    CAST(SUM(wsc.wscore_micro) AS BIGINT) AS pscore_micro
        |  FROM runs r JOIN wsc ON wsc.w = r.w
        |  GROUP BY r.doc_id, r.grp
        |)
        |SELECT o.phrase, CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(MAX(p.pscore_micro) AS BIGINT) AS score_micro
        |FROM occ o JOIN ps p ON p.doc_id = o.doc_id AND p.grp = o.grp
        |WHERE o.plen >= 2
        |GROUP BY o.phrase
        |ORDER BY score_micro DESC, o.phrase LIMIT 30""".stripMargin,
  )
}
