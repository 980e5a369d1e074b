package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 batch 3: tokenizer compression economics, graph
  * neighborhood growth, and robust time-series anomaly flags.
  *
  *  - `tok_bpe_encode`: the ENCODE side of the trained tokenizer —
  *    applies tok_bpe_train3's three learned merges to the whole
  *    word vocabulary and reports the compression curve per round
  *    (word types, weighted symbol count, avg symbols/word). The
  *    number that justifies each merge's existence: a merge that
  *    does not bend this curve is wasted vocab budget.
  *  - `graph_2hop_reach`: exact ≤2-hop neighborhood size per node of
  *    the simhash near-dup graph — the blast-radius audit before
  *    transitive cluster collapse (a node whose 2-hop ball is 10×
  *    its degree sits in a chain that transitive merging would
  *    over-delete; triangles/clustering measure density, this
  *    measures growth).
  *  - `ts_rolling_median_dev`: 7-day rolling-median anomaly flags on
  *    the daily volume series — the robust detector (a spike does
  *    not drag its own baseline the way a rolling mean does). Odd
  *    window ⇒ the median is an exact element of the integer
  *    lattice; flag = deviation ≥ half the rolling median.
  *
  * 100 TB shapes: the encode pass is |vocab|-sized (words, not
  * corpus rows — the fold runs once per word TYPE, weighted by
  * count); 2-hop reach is one self-join of the undirected edge list
  * (fan-out bounded by Σdeg², collision-bounded on this graph, with
  * hub-cap guards the bipartite audits established for power-law
  * inputs); the rolling median is one window over the |days|-row
  * aggregate, never the raw events.
  */
object Ext40Queries {

  // ---------------------------------------------------------------
  // tok_bpe_encode
  // ---------------------------------------------------------------

  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val w0 = Ext14Queries.bpeVocab(spark, dir).cache()
    val w1 = Ext14Queries.bpeApplyMerge(w0,
      Ext14Queries.bpeBestPair(w0).cache()).cache()
    val w2 = Ext14Queries.bpeApplyMerge(w1,
      Ext14Queries.bpeBestPair(w1).cache()).cache()
    val w3 = Ext14Queries.bpeApplyMerge(w2,
      Ext14Queries.bpeBestPair(w2).cache()).cache()
    def stats(r: Int, w: DataFrame): DataFrame =
      w.agg(count(lit(1)).as("n_word_types"),
          sum(col("cnt")).as("n_words"),
          sum(col("cnt") * size(col("s"))).as("n_symbols"))
        .select(lit(r.toLong).as("round"), col("n_word_types"),
          col("n_words"), col("n_symbols"),
          expr("n_symbols * 1000000 div n_words")
            .as("avg_symbols_micro"))
    stats(0, w0).unionByName(stats(1, w1))
      .unionByName(stats(2, w2)).unionByName(stats(3, w3))
      .orderBy("round")
  }

  // ---------------------------------------------------------------
  // graph_2hop_reach
  // ---------------------------------------------------------------

  def twoHopReach(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDupGraph.simhashPairs5(spark, dir)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val und = pairs.unionByName(
      pairs.select(col("b").as("a"), col("a").as("b"))).cache()
    val deg = und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
    val hop2 = und.as("u1")
      .join(und.select(col("a").as("m"), col("b").as("r")).as("u2"),
        col("u1.b") === col("u2.m"))
      .filter(col("u2.r") =!= col("u1.a"))
      .select(col("u1.a").as("node"), col("u2.r").as("reach"))
    val ball = hop2
      .unionByName(und.select(col("a").as("node"), col("b").as("reach")))
      .distinct()
      .groupBy("node").agg(count(lit(1)).as("reach2"))
    deg.join(ball, "node")
      .withColumn("growth_micro", expr("reach2 * 1000000 div deg"))
      .select("node", "deg", "reach2", "growth_micro")
      .orderBy("node")
  }

  // ---------------------------------------------------------------
  // ts_rolling_median_dev
  // ---------------------------------------------------------------

  def rollingMedianDev(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .select(
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("day").agg(sum("vm").as("v_day"))
    // bounded domain: `daily` is one row per DAY (horizon-bounded)
    val w7 = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("rn", row_number().over(Window.orderBy("day")))
      // 7 values, odd -> the median IS the 4th element: exact on the
      // integer lattice, interpolation never fires
      .withColumn("med",
        percentile(col("v_day"), lit(0.5)).over(w7).cast("long"))
      .filter(col("rn") >= 7)
      .withColumn("dev_milli", col("v_day") - col("med"))
      .withColumn("is_anomaly",
        abs(col("dev_milli")) * 2 >= col("med"))
      .select("day", "v_day", "med", "dev_milli", "is_anomaly")
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tok_bpe_encode" -> bpeEncode _,
    "graph_2hop_reach" -> twoHopReach _,
    "ts_rolling_median_dev" -> rollingMedianDev _,
  )

  /** Shared simhash-pair CTE prefix (the dedup_simhash_pairs oracle
    * through `pairs`), reused by the 2-hop oracle.
    */
  private val simhashPairsCte: String =
    """WITH tokrows AS (
      |  SELECT doc_id AS id,
      |    md5(unnest(string_split_regex(trim(text), '\s+'))) AS h
      |  FROM documents
      |), votes AS (
      |  SELECT id, bit,
      |    SUM(CASE WHEN
      |      ((strpos('0123456789abcdef', substr(h, bit // 4 + 1, 1)) - 1)
      |        & (1 << (3 - bit % 4))) > 0 THEN 1 ELSE -1 END) AS v
      |  FROM tokrows, UNNEST(range(0, 60)) AS b(bit)
      |  GROUP BY id, bit
      |), fps AS (
      |  SELECT id,
      |    CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << (59 - bit)
      |        ELSE 0 END) AS BIGINT) AS fp
      |  FROM votes GROUP BY id
      |), pairs AS (
      |  SELECT a.id AS a, b.id AS b
      |  FROM fps a JOIN fps b ON a.id < b.id
      |  WHERE bit_count(xor(a.fp, b.fp)) <= 5
      |)""".stripMargin

  val oracle: Map[String, String] = Map(
    "tok_bpe_encode" ->
      ("""WITH RECURSIVE words AS (
        |  SELECT w AS word, COUNT(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
        |      AS w
        |    FROM documents)
        |  WHERE len(w) >= 2 GROUP BY w
        |), w0 AS (
        |  SELECT string_split(word, '') AS s, cnt FROM words
        |)""".stripMargin +
        Ext14Queries.bpeRoundSql(1, "w0") +
        Ext14Queries.bpeRoundSql(2, "w1") +
        Ext14Queries.bpeRoundSql(3, "w2") + """
        |, stats AS (
        |  SELECT 0 AS round, * FROM w0
        |  UNION ALL SELECT 1, * FROM w1
        |  UNION ALL SELECT 2, * FROM w2
        |  UNION ALL SELECT 3, * FROM w3)
        |SELECT CAST(round AS BIGINT) AS round,
        |  CAST(COUNT(*) AS BIGINT) AS n_word_types,
        |  CAST(SUM(cnt) AS BIGINT) AS n_words,
        |  CAST(SUM(cnt * len(s)) AS BIGINT) AS n_symbols,
        |  CAST(SUM(cnt * len(s)) * 1000000 // SUM(cnt) AS BIGINT)
        |    AS avg_symbols_micro
        |FROM stats GROUP BY round
        |ORDER BY round""".stripMargin),
    "graph_2hop_reach" ->
      (simhashPairsCte + """, und AS (
        |  SELECT a, b FROM pairs
        |  UNION ALL SELECT b, a FROM pairs
        |), deg AS (
        |  SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
        |  FROM und GROUP BY a
        |), ball AS (
        |  SELECT node, CAST(COUNT(*) AS BIGINT) AS reach2 FROM (
        |    SELECT u1.a AS node, u2.b AS reach
        |    FROM und u1 JOIN und u2 ON u2.a = u1.b
        |    WHERE u2.b <> u1.a
        |    UNION
        |    SELECT a AS node, b AS reach FROM und)
        |  GROUP BY node)
        |SELECT d.node, d.deg, b.reach2,
        |  CAST(b.reach2 * 1000000 // d.deg AS BIGINT) AS growth_micro
        |FROM deg d JOIN ball b ON b.node = d.node
        |ORDER BY d.node""".stripMargin),
    "ts_rolling_median_dev" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) AS day,
        |    CAST(SUM(CAST(round(value * 1000) AS BIGINT)) AS BIGINT)
        |      AS v_day
        |  FROM events GROUP BY 1
        |), win AS (
        |  SELECT day, v_day,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    CAST(median(v_day) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS med
        |  FROM daily)
        |SELECT day, v_day, med,
        |  CAST(v_day - med AS BIGINT) AS dev_milli,
        |  (abs(v_day - med) * 2 >= med) AS is_anomaly
        |FROM win WHERE rn >= 7
        |ORDER BY day""".stripMargin,
  )
}
