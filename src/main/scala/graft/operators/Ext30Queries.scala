package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 4: cross-modal alignment, dedup survivorship, and
  * offline policy evaluation.
  *
  *  - `mm_clip_align`: the CLIP-style cross-modal alignment audit —
  *    cosine between each document's MEDIA feature (the 8-bin byte
  *    histogram the decode stub extracts; here computed as exact
  *    integer counts so the audit is hash-checkable) and the head of
  *    its paired text EMBEDDING (`vec_id == doc_id`), rolled up per
  *    source with a misalignment flag. In production the media side
  *    is a real image/audio encoder output; the plan — narrow
  *    per-row featurize, key-join to the embedding table, per-source
  *    aggregate — is exactly this one.
  *  - `dedup_survivorship`: per-source retention after near-dup
  *    keep-best canonicalization — joins the shared CC labels
  *    ([[NearDupGraph]]) with the keep-longest rule and charges each
  *    dropped duplicate to its source; the "which sources are
  *    duplicating whom" report a curation pipeline publishes next to
  *    `dataset_card`.
  *  - `ev_bandit_replay`: offline replay evaluation (Li et al.'s
  *    replay method) of the greedy policy "play the arm with the
  *    best first-half mean": fit on the pre-period, evaluate on
  *    post-period events whose LOGGED arm matches the policy's
  *    choice — the standard counterfactual estimate when only logged
  *    bandit data exists.
  *
  * 100 TB shapes: clip-align is a narrow map + equi-join on the id
  * (embedding table bucketed the same way) + a |sources| aggregate;
  * survivorship reads the materialized pair-graph labels (Derived)
  * and shuffles only label-sized tables; the replay is two
  * conditional aggregates + a 1-row argmax broadcast.
  */
object Ext30Queries {

  // ---------------------------------------------------------------
  // mm_clip_align
  // ---------------------------------------------------------------

  def clipAlign(spark: SparkSession, dir: String): DataFrame = {
    // exact integer 8-bin byte histogram (the decodeStub contract:
    // bin = byte % 8 — counts instead of the stub's normalized
    // floats; cosine is normalization-invariant)
    val chars = split(col("text"), "")
    val hist = transform(sequence(lit(0), lit(7)), p =>
      size(filter(chars, ch => ascii(ch) % 8 === p)).cast("long"))
    val media = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), hist.as("h"))
    val emb = t(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"),
        slice(col("embedding"), 1, 8).as("e8"))
    val scored = media.join(emb, "doc_id")
      .withColumn("dot", aggregate(
        zip_with(col("h"), col("e8"),
          (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0d), (acc, v) => acc + v))
      .withColumn("nh", sqrt(aggregate(transform(col("h"),
        x => x.cast("double") * x.cast("double")), lit(0.0d),
        (acc, v) => acc + v)))
      .withColumn("ne", sqrt(aggregate(transform(col("e8"),
        x => x.cast("double") * x.cast("double")), lit(0.0d),
        (acc, v) => acc + v)))
      .withColumn("align_micro",
        expr("cast(round(dot / (nh * ne) * 1000000) as bigint)"))
    scored.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("align_micro").as("sum_align_micro"),
        min("align_micro").as("min_align_micro"),
        sum(when(col("align_micro") < 0, 1L).otherwise(0L))
          .as("n_misaligned"))
      .withColumn("mean_align_micro",
        // sums can be negative: floor-div via pmod on BOTH engines
        expr("(sum_align_micro - pmod(sum_align_micro, n_docs))" +
          " div n_docs"))
      .select("source", "n_docs", "mean_align_micro",
        "min_align_micro", "n_misaligned")
      .orderBy("source")
  }

  // ---------------------------------------------------------------
  // dedup_survivorship
  // ---------------------------------------------------------------

  def survivorship(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long")
          .as("n_tokens"))
    val labels = NearDupGraph.ccLabels(spark, dir)
    val w = Window.partitionBy("cluster")
      .orderBy(col("n_tokens").desc, col("id"))
    val members = labels
      .join(docs.select(col("doc_id").as("id"), col("n_tokens")), "id")
      .withColumn("is_keeper", row_number().over(w) === 1)
    docs.join(members.select(col("id").as("doc_id"),
        col("is_keeper")), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_keeper").isNotNull, 1L).otherwise(0L))
          .as("n_clustered"),
        sum(when(col("is_keeper") === false, 1L).otherwise(0L))
          .as("n_dropped"),
        sum(when(col("is_keeper") === false, col("n_tokens"))
          .otherwise(0L)).as("tokens_dropped"))
      .withColumn("n_survivors", col("n_docs") - col("n_dropped"))
      .withColumn("survival_micro",
        expr("n_survivors * 1000000 div n_docs"))
      .select("source", "n_docs", "n_clustered", "n_dropped",
        "n_survivors", "tokens_dropped", "survival_micro")
      .orderBy("source")
  }

  // ---------------------------------------------------------------
  // ev_bandit_replay
  // ---------------------------------------------------------------

  def banditReplay(spark: SparkSession, dir: String): DataFrame = {
    val cutSec = 1705363200L // 2024-01-16T00:00:00Z
    val ev = t(spark, dir, "events")
      .select(col("event_type").as("arm"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    val fit = ev.filter(col("tsec") < cutSec)
      .groupBy("arm")
      .agg(count(lit(1)).as("n_fit"), sum("vm").as("s_fit"))
      .withColumn("fit_mean_milli", expr("s_fit div n_fit"))
    val target = broadcast(fit
      // bounded domain: one row per arm (|arms| small by design)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("fit_mean_milli").desc, col("arm"))))
      .filter(col("rk") === 1)
      .select(col("arm").as("target_arm"),
        col("fit_mean_milli").as("target_fit_mean_milli")))
    val post = ev.filter(col("tsec") >= cutSec)
    post.crossJoin(target)
      .agg(
        max("target_arm").as("target_arm"),
        max("target_fit_mean_milli").as("target_fit_mean_milli"),
        count(lit(1)).as("n_post"),
        sum("vm").as("s_post"),
        sum(when(col("arm") === col("target_arm"), 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("arm") === col("target_arm"), col("vm"))
          .otherwise(0L)).as("s_matched"))
      .select(col("target_arm"), col("target_fit_mean_milli"),
        col("n_matched"),
        expr("s_matched div n_matched").as("replay_mean_milli"),
        col("n_post"),
        expr("s_post div n_post").as("overall_mean_milli"),
        expr("s_matched div n_matched - s_post div n_post")
          .as("lift_milli"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_clip_align" -> clipAlign _,
    "dedup_survivorship" -> survivorship _,
    "ev_bandit_replay" -> banditReplay _,
  )

  /** keep-best chain shared by the survivorship oracle (identical to
    * the dedup_keep_best oracle's label derivation).
    */
  private val labelChain =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
      |  FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id AS id,
      |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
      |  FROM toks, UNNEST(range(1, greatest(len(tk) - 1, 1))) AS r(i)
      |), sig AS (
      |  SELECT id, seed, MIN(md5(seed || '|' || shingle)) AS mh
      |  FROM sh, UNNEST(range(0, 16)) AS sd(seed)
      |  GROUP BY id, seed
      |), bandsig AS (
      |  SELECT id, seed // 4 AS band,
      |    string_agg(mh, ',' ORDER BY seed) AS bsig
      |  FROM sig GROUP BY id, seed // 4
      |), cands AS (
      |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
      |  FROM bandsig a JOIN bandsig b
      |    ON a.band = b.band AND a.bsig = b.bsig AND a.id < b.id
      |), sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
      |common AS (
      |  SELECT c.id_a, c.id_b, COUNT(*) AS common
      |  FROM cands c
      |  JOIN sh a ON a.id = c.id_a
      |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
      |  GROUP BY c.id_a, c.id_b),
      |pairs AS (
      |  SELECT id_a, id_b FROM common
      |  JOIN sizes sa ON sa.id = id_a
      |  JOIN sizes sb ON sb.id = id_b
      |  WHERE CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE) >= 0.1),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |nodes AS (SELECT DISTINCT a AS id FROM edges),
      |walk(a, b) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT w.a, e.b FROM walk w JOIN edges e ON e.a = w.b)
      |, labels AS (
      |  SELECT a AS id, MIN(b) AS cluster FROM walk GROUP BY a)""".stripMargin

  val oracle: Map[String, String] = Map(
    "mm_clip_align" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    list_transform(range(0, 8), p ->
        |      CAST(len(list_filter(string_split(text, ''),
        |        ch -> ord(ch) % 8 = p)) AS DOUBLE)) AS hd
        |  FROM documents
        |), j AS (
        |  SELECT h.doc_id, h.source, h.hd,
        |    list_transform(e.embedding[1:8], x -> CAST(x AS DOUBLE))
        |      AS e8
        |  FROM h JOIN embeddings e ON e.vec_id = h.doc_id
        |), s AS (
        |  SELECT doc_id, source,
        |    CAST(round(
        |      list_sum(list_transform(range(1, 9),
        |        i -> hd[i] * e8[i]))
        |      / (sqrt(list_sum(list_transform(hd, x -> x * x)))
        |        * sqrt(list_sum(list_transform(e8, x -> x * x))))
        |      * 1000000) AS BIGINT) AS align_micro
        |  FROM j)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST((sum(align_micro)
        |    - ((sum(align_micro) % count(*)) + count(*)) % count(*))
        |    // count(*) AS BIGINT) AS mean_align_micro,
        |  CAST(min(align_micro) AS BIGINT) AS min_align_micro,
        |  CAST(sum(CASE WHEN align_micro < 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_misaligned
        |FROM s GROUP BY source ORDER BY source""".stripMargin,
    "dedup_survivorship" -> (labelChain +
      """, sized AS (
        |  SELECT l.id, l.cluster,
        |    CAST(len(string_split_regex(trim(d.text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM labels l JOIN documents d ON d.doc_id = l.id
        |), ranked AS (
        |  SELECT cluster, id, n_tokens,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY n_tokens DESC, id) AS rn
        |  FROM sized)
        |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN r.id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_clustered,
        |  CAST(sum(CASE WHEN r.rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(count(*) - sum(CASE WHEN r.rn > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_survivors,
        |  CAST(sum(CASE WHEN r.rn > 1
        |    THEN len(string_split_regex(trim(d.text), '\s+'))
        |    ELSE 0 END) AS BIGINT) AS tokens_dropped,
        |  CAST((count(*) - sum(CASE WHEN r.rn > 1 THEN 1 ELSE 0 END))
        |    * 1000000 // count(*) AS BIGINT) AS survival_micro
        |FROM documents d LEFT JOIN ranked r ON r.id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin),
    "ev_bandit_replay" ->
      """WITH ev AS (
        |  SELECT event_type AS arm,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), fit AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS n_fit,
        |    CAST(sum(vm) AS BIGINT) AS s_fit
        |  FROM ev WHERE tsec < 1705363200 GROUP BY arm
        |), tgt AS (
        |  SELECT arm AS target_arm,
        |    s_fit // n_fit AS target_fit_mean_milli
        |  FROM fit ORDER BY s_fit // n_fit DESC, arm LIMIT 1
        |), post AS (SELECT * FROM ev WHERE tsec >= 1705363200)
        |SELECT t.target_arm,
        |  CAST(t.target_fit_mean_milli AS BIGINT)
        |    AS target_fit_mean_milli,
        |  CAST(sum(CASE WHEN p.arm = t.target_arm THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_matched,
        |  CAST(sum(CASE WHEN p.arm = t.target_arm THEN p.vm ELSE 0 END)
        |    // sum(CASE WHEN p.arm = t.target_arm THEN 1 ELSE 0 END)
        |    AS BIGINT) AS replay_mean_milli,
        |  CAST(count(*) AS BIGINT) AS n_post,
        |  CAST(sum(p.vm) // count(*) AS BIGINT) AS overall_mean_milli,
        |  CAST(sum(CASE WHEN p.arm = t.target_arm THEN p.vm ELSE 0 END)
        |    // sum(CASE WHEN p.arm = t.target_arm THEN 1 ELSE 0 END)
        |    - sum(p.vm) // count(*) AS BIGINT) AS lift_milli
        |FROM post p, tgt t
        |GROUP BY t.target_arm, t.target_fit_mean_milli""".stripMargin,
  )
}
