package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 batch: retrieval + layout operators — inverted-index build
  * (posting lists), BM25 lexical top-k (the sparse complement to the
  * embedding ANN family), a deterministic count-min sketch, and
  * z-order locality layout. All hash-exact against DuckDB oracles;
  * float math only where rounded to fixed decimals before ranking.
  */
object Ext6Queries {

  /** Inverted-index build: term -> (df, total tf, md5 of the ordered
    * posting list). The core retrieval-corpus artifact: one shuffle on
    * (term, doc) for tf, one on term for the posting aggregation —
    * both hash-partitioned, no skew beyond natural term frequency (a
    * production build salts the few ultra-common terms or drops them
    * as stopwords — same maxDf bound as jaccardPairs). Postings are
    * carried as md5 of the comma-joined sorted doc list so the oracle
    * compares content without shipping megabytes per term.
    */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    val tf = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("postings_hash"))
      .filter(col("df") >= 5)
      .orderBy("term")
  }

  /** BM25 top-20 for a fixed 3-term query (k1=1.2, b=0.75): classic
    * sparse retrieval over the inverted statistics. Document length
    * and average length are kept integer (milli-token avgdl) so the
    * only floats are the final per-term scores, rounded to 4 decimals
    * BEFORE the ranking window — the rank order is then deterministic
    * across engines. Scale: the tf table is one narrow shuffle; the
    * score is a broadcast-join of 3 idf rows against per-doc tf, and
    * top-k is TakeOrderedAndProject (no global sort materialized).
    */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "merge", "window")
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
        col("tk"))
    // corpus stats ride as a broadcast 1-row aggregate, NOT
    // construction-time jobs: building this DataFrame must stay lazy
    // (plan sweeps/audits inspect plans without paying corpus scans)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs_d"),
      expr("CAST(sum(dl) * 1000 div count(1) AS BIGINT)")
        .as("avgdl_milli"))
    val tf = docs
      .select(col("doc_id"), col("dl"),
        explode(col("tk")).as("term"))
      .filter(col("term").isin(terms.map(lit): _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(col("n_docs_d") - col("df") + 0.5)
          - log(col("df") + 0.5))
    // per-term contribution quantized to integer 1e-4 units BEFORE the
    // sum: summing doubles is addition-order-dependent across engines,
    // summing BIGINTs is not
    val scored = tf
      .join(broadcast(idf.select("term", "idf", "avgdl_milli")), "term")
      .withColumn("contrib_e4",
        round(col("idf") * (col("tf") * 2.2)
          / (col("tf") + (col("dl") * 1000.0 / col("avgdl_milli")
            * 0.75 + 0.25) * 1.2) * 10000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(col("contrib_e4")).as("score_e4"))
    // sort-limit FIRST (TakeOrderedAndProject — per-partition heaps),
    // then rank the 20 survivors: the old rank-then-filter ran every
    // scored doc through one global window task (r7 verdict ask #4)
    scored
      .orderBy(col("score_e4").desc, col("doc_id")).limit(20)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_e4").desc, col("doc_id"))))
      .withColumn("score", col("score_e4") / 10000.0)
      .select("rank", "doc_id", "n_terms_hit", "score_e4", "score")
      .orderBy("rank")
  }

  /** Deterministic count-min sketch (4 rows x 64 buckets) of supplier
    * frequency in lineitem: cell(r, b) = #rows with
    * md5-derived hash(r, l_suppkey) landing in b. The sketch IS a
    * groupBy — one shuffle of 256 cells regardless of input size,
    * the textbook sublinear summary for 100 TB frequency estimation;
    * estimates (min over rows) are checked in the spec against exact
    * counts. The md5 row-hash family is the same engine-portable
    * trick as text_hash_split.
    */
  def cmsSketch(spark: SparkSession, dir: String): DataFrame = {
    // four unioned single-column scans beat one scan + Generate here:
    // each branch stays a fully codegen'd scan->hash->partial-agg
    // pipeline (measured ~1.0s vs ~1.9s for the explode variant at
    // sf0.1); the scan itself is one pruned parquet column
    val li = t(spark, dir, "lineitem").select(col("l_suppkey"))
    val rows = (0 until 4).map { r =>
      li.select(lit(r).as("sketch_row"),
        (conv(substring(md5(concat_ws(":", lit(r), col("l_suppkey"))),
          1, 4), 16, 10).cast("long") % 64).as("bucket"))
    }.reduce(_ unionAll _)
    rows.groupBy(col("sketch_row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("sketch_row", "bucket")
  }


  /** Z-order layout audit: interleave (custkey, order epoch-day) into
    * a Morton code, bucket by its high bits, and report each bucket's
    * bounding box in BOTH dimensions. The point of the operator: the
    * per-bucket min/max ranges this emits are exactly the column
    * statistics a parquet writer records per file — tight boxes in
    * both dimensions mean scans filtered on EITHER column prune most
    * files, which is the reason to z-order 100 TB instead of sorting
    * by one key. The production write path is
    * `df.repartitionByRange(col("z")).sortWithinPartitions("z")
    * .write.parquet(...)`; this query is its audit plan, kept
    * deterministic (fixed-width buckets, no range sampling) so the
    * oracle can hash it.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val day = "datediff(o_orderdate, date'1992-01-01')"
    t(spark, dir, "orders")
      .withColumn("z", graft.functions.GraftFunctions.morton(
        expr("o_custkey & 65535"), expr(s"($day) & 65535")))
      .withColumn("zbucket", expr("shiftright(z, 16)"))
      .groupBy(col("zbucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_custkey")).as("cust_min"),
        max(col("o_custkey")).as("cust_max"),
        min(expr(day)).cast("long").as("day_min"),
        max(expr(day)).cast("long").as("day_max"))
      .orderBy("zbucket")
  }

  /** Click->view attribution through the PLANNED as-of join (the
    * custom logical node + Strategy + AsOfJoinExec merge —
    * plans/AsOfJoinPlan.scala), oracle-checked against the same
    * window-SQL semantics ev_click_attrib uses. Times are scaled to
    * 2·us (views) / 2·us+1 (clicks) so "view at identical micros
    * matches the click" holds even under exact timestamp ties — the
    * fixture has none (verified), but the operator shouldn't depend
    * on that. Scale shape: two shuffles (one per side), one
    * streaming merge pass, O(1) state per partition — and ZERO extra
    * exchange when the inputs are already bucketed by user
    * (PlannedAsOfSpec proves the no-op-exchange property).
    */
  def asofPlanned(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .withColumn("us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("us"),
        (col("us") * 2 + 1).as("t2"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("us").as("view_us"),
        round(col("value") * 1000).cast("long").as("view_vm"),
        (col("us") * 2).as("t2v"))
    graft.plans.PlannedAsOf.asofJoin(clicks, views, "user_id",
        "t2", "t2v", Seq("view_us", "view_vm"))
      .select(col("user_id"), col("event_id"),
        col("us").as("click_us"), col("view_us"), col("view_vm"))
      .orderBy("user_id", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_inverted_index" -> invertedIndex _,
    "text_bm25_topk" -> bm25TopK _,
    "sketch_cms" -> cmsSketch _,
    "layout_zorder" -> zorderLayout _,
    "q47_asof_planned" -> asofPlanned _)

  private[operators] def zSql(a: String, b: String): String =
    (0 until 16).map(i =>
      s"(((($a) >> $i) & 1) << ${2 * i}) | (((($b) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  val oracle: Map[String, String] = Map(
    "text_inverted_index" ->
      """WITH tf AS (
        |  SELECT t.term, d.doc_id, COUNT(*) AS tf
        |  FROM documents d,
        |    UNNEST(string_split_regex(trim(d.text), '\s+')) AS t(term)
        |  GROUP BY t.term, d.doc_id)
        |SELECT term, COUNT(*) AS df,
        |  CAST(SUM(tf) AS BIGINT) AS tf_total,
        |  md5(string_agg(CAST(doc_id AS VARCHAR), ','
        |    ORDER BY doc_id)) AS postings_hash
        |FROM tf
        |GROUP BY term
        |HAVING COUNT(*) >= 5
        |ORDER BY term""".stripMargin,
    "text_bm25_topk" ->
      """WITH docs AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS dl,
        |    string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), stats AS (
        |  SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(dl) * 1000 // COUNT(*) AS BIGINT) AS avgdl_milli
        |  FROM docs
        |), tf AS (
        |  SELECT d.doc_id, d.dl, t.term, COUNT(*) AS tf
        |  FROM docs d, UNNEST(d.tk) AS t(term)
        |  WHERE t.term IN ('spark', 'merge', 'window')
        |  GROUP BY d.doc_id, d.dl, t.term
        |), idf AS (
        |  SELECT term, COUNT(*) AS df,
        |    ln(CAST((SELECT n_docs FROM stats) AS DOUBLE) - COUNT(*)
        |        + 0.5)
        |      - ln(COUNT(*) + 0.5) AS idf
        |  FROM tf GROUP BY term
        |), scored AS (
        |  SELECT tf.doc_id, COUNT(*) AS n_terms_hit,
    |    CAST(SUM(CAST(round(idf.idf * (tf.tf * 2.2)
        |      / (tf.tf + (tf.dl * 1000.0
        |        / (SELECT avgdl_milli FROM stats) * 0.75 + 0.25) * 1.2)
        |      * 10000, 0) AS BIGINT)) AS BIGINT) AS score_e4
        |  FROM tf JOIN idf ON idf.term = tf.term
        |  GROUP BY tf.doc_id)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_e4 DESC, doc_id)
        |    AS INT) AS "rank",
        |  doc_id, n_terms_hit, score_e4,
        |  score_e4 / 10000.0 AS score
        |FROM scored
        |QUALIFY "rank" <= 20
        |ORDER BY "rank"""".stripMargin,
    "sketch_cms" ->
      """WITH cells AS (
        |  SELECT r.r AS sketch_row,
        |    CAST((
        |      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |      + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |      + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |      + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)
        |    ) % 64 AS BIGINT) AS bucket
        |  FROM (SELECT l_suppkey FROM lineitem) l,
        |    UNNEST(range(0, 4)) AS r(r),
        |    LATERAL (SELECT md5(r.r || ':' || l.l_suppkey) AS h) mh)
        |SELECT sketch_row, bucket, COUNT(*) AS cnt
        |FROM cells
        |GROUP BY sketch_row, bucket
        |ORDER BY sketch_row, bucket""".stripMargin,
    "q47_asof_planned" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events WHERE event_type IN ('view', 'click')
        |), lv AS (
        |  SELECT user_id, event_id, event_type, us,
        |    last_value(CASE WHEN event_type = 'view' THEN us END
        |      IGNORE NULLS) OVER w AS view_us,
        |    last_value(CASE WHEN event_type = 'view' THEN vm END
        |      IGNORE NULLS) OVER w AS view_vm
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY us, CASE WHEN event_type = 'view' THEN 0 ELSE 1
        |      END, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, us AS click_us, view_us, view_vm
        |FROM lv WHERE event_type = 'click'
        |ORDER BY user_id, event_id""".stripMargin,
    "layout_zorder" -> {
      val day = "date_diff('day', DATE '1992-01-01', o_orderdate)"
      val z = zSql("o_custkey & 65535", s"($day) & 65535")
      s"""WITH zz AS (
         |  SELECT o_custkey, $day AS day, ($z) AS z
         |  FROM orders)
         |SELECT z >> 16 AS zbucket, COUNT(*) AS n_orders,
         |  MIN(o_custkey) AS cust_min, MAX(o_custkey) AS cust_max,
         |  CAST(MIN(day) AS BIGINT) AS day_min,
         |  CAST(MAX(day) AS BIGINT) AS day_max
         |FROM zz
         |GROUP BY zbucket
         |ORDER BY zbucket""".stripMargin
    })
}
