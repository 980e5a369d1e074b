package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 9: difference-in-differences, LSH parameter tuning,
  * and partition rebalancing.
  *
  *  - `ev_ab_did`: the 2×2 difference-in-differences estimator —
  *    arm (user_id % 2) × period (pre/post cut) cell means from one
  *    conditional-moment aggregate; DD effect = (B_post − B_pre) −
  *    (A_post − A_pre). The quasi-experimental workhorse when
  *    randomization is suspect; complements ev_ab_cuped (which
  *    assumes it is sound).
  *  - `dedup_lsh_tuning`: the (bands × rows) operating-point report —
  *    re-band the SAME 16 MinHash signatures as 2×8 / 4×4 / 8×2,
  *    measure candidate pairs, verified pairs (J ≥ 0.1) and
  *    precision per configuration. This is how an operator picks the
  *    LSH knob: the 16-hash signature table is computed ONCE (the
  *    stored index — [[NearDupGraph]] shape); each config is one
  *    extra band-bucket join over doc×bands rows, never a new
  *    MinHash pass.
  *  - `cdc_rebalance_plan`: partition→worker assignment audit — the
  *    `partitionId % N` rule the reference hardwires
  *    (YqlWriter.java:117-120) vs a volume-aware rank-striped
  *    assignment, with per-worker loads and imbalance ratios for
  *    both. The report that says whether modulo placement is starving
  *    a worker; the striped rule (volume-rank % N) is deterministic
  *    and needs only a |partitions|-sized sort.
  *
  * 100 TB shapes: DD is one conditional aggregate; LSH tuning costs
  * 3 band-bucket joins over the cached signature table (collision-
  * bounded, the lshCandidates contract); the rebalance plan runs on
  * the |partitions| table after one hash aggregate over the log.
  */
object Ext35Queries {

  // ---------------------------------------------------------------
  // ev_ab_did
  // ---------------------------------------------------------------

  def abDid(spark: SparkSession, dir: String): DataFrame = {
    val cutSec = 1705363200L // 2024-01-16T00:00:00Z
    val ev = t(spark, dir, "events")
      .select((col("user_id") % 2).as("grp"),
        (unix_timestamp(graft.Tables.eventsTsMicros) >= cutSec)
          .as("post"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
    def cell(g: Int, p: Boolean, c: org.apache.spark.sql.Column) =
      sum(when(col("grp") === g && col("post") === p, c).otherwise(0L))
    ev.agg(
        cell(0, p = false, lit(1L)).as("n_a_pre"),
        cell(0, p = false, col("vm")).as("s_a_pre"),
        cell(0, p = true, lit(1L)).as("n_a_post"),
        cell(0, p = true, col("vm")).as("s_a_post"),
        cell(1, p = false, lit(1L)).as("n_b_pre"),
        cell(1, p = false, col("vm")).as("s_b_pre"),
        cell(1, p = true, lit(1L)).as("n_b_post"),
        cell(1, p = true, col("vm")).as("s_b_post"))
      // means and the DD contrast — doubles with identical expression
      // text, rounded to the milli lattice
      .select(
        col("n_a_pre"), col("n_a_post"), col("n_b_pre"),
        col("n_b_post"),
        expr("s_a_pre div n_a_pre").as("mean_a_pre_milli"),
        expr("s_a_post div n_a_post").as("mean_a_post_milli"),
        expr("s_b_pre div n_b_pre").as("mean_b_pre_milli"),
        expr("s_b_post div n_b_post").as("mean_b_post_milli"),
        expr("cast(round((cast(s_b_post as double) / cast(n_b_post as double)" +
          " - cast(s_b_pre as double) / cast(n_b_pre as double))" +
          " - (cast(s_a_post as double) / cast(n_a_post as double)" +
          " - cast(s_a_pre as double) / cast(n_a_pre as double)))" +
          " as bigint)").as("dd_effect_milli"))
  }

  // ---------------------------------------------------------------
  // dedup_lsh_tuning
  // ---------------------------------------------------------------

  def lshTuning(spark: SparkSession, dir: String): DataFrame = {
    val sh = NearDupGraph.shingleTable(spark, dir)
    val sig = Dedup.minhashSignatures(sh, 16).cache()
    val szOf = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val sized = sig.join(szOf, "id")
    val minJ = NearDupGraph.MinJ
    def configReport(bands: Int): DataFrame = {
      val rowsPerBand = 16 / bands
      val bandSig = sized.select(col("id"), col("sz"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            concat_ws(",", (0 until rowsPerBand).map(r =>
              col(s"mh${b * rowsPerBand + r}")): _*).as("bsig"))
        }: _*)).as("bs"))
        .select(col("id"), col("sz"), col("bs.band").as("band"),
          col("bs.bsig").as("bsig"))
      val cands = Dedup.lshCandidates(bandSig, minJ).cache()
      val verified = Dedup.verifyJaccard(cands, sh, minJ)
      cands.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(verified.agg(count(lit(1)).as("n_verified")))
        .select(lit(bands.toLong).as("bands"),
          lit(rowsPerBand.toLong).as("rows_per_band"),
          col("n_candidates"), col("n_verified"),
          expr("n_verified * 1000000 div greatest(n_candidates, 1L)")
            .as("precision_micro"))
    }
    configReport(2).unionByName(configReport(4))
      .unionByName(configReport(8))
      .orderBy("bands")
  }

  // ---------------------------------------------------------------
  // cdc_rebalance_plan
  // ---------------------------------------------------------------

  def rebalancePlan(spark: SparkSession, dir: String): DataFrame = {
    val workers = 4
    val parts = t(spark, dir, "events")
      .select((col("user_id") % 32).as("partition"))
      .groupBy("partition").agg(count(lit(1)).as("n_msgs"))
    // bounded domain: one row per topic partition (32) — config-
    // bounded, not corpus-sized
    val wRank = Window.orderBy(col("n_msgs").desc, col("partition"))
    val assigned = parts
      .withColumn("w_mod", col("partition") % workers)
      .withColumn("rk", row_number().over(wRank))
      // volume-rank striping: heaviest partitions fan across workers
      .withColumn("w_striped", (col("rk") - 1) % workers)
    def loads(wcol: String, tag: String): DataFrame =
      assigned.groupBy(col(wcol).cast("long").as("worker"))
        .agg(sum("n_msgs").as("load"),
          count(lit(1)).as("n_partitions"))
        .withColumn("rule", lit(tag))
    loads("w_mod", "modulo").unionByName(loads("w_striped", "striped"))
      .select("rule", "worker", "n_partitions", "load")
      .orderBy("rule", "worker")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_ab_did" -> abDid _,
    "dedup_lsh_tuning" -> lshTuning _,
    "cdc_rebalance_plan" -> rebalancePlan _,
  )

  val oracle: Map[String, String] = Map(
    "ev_ab_did" ->
      """WITH ev AS (
        |  SELECT user_id % 2 AS grp,
        |    (CAST(floor(epoch(ts)) AS BIGINT) >= 1705363200) AS post,
        |    CAST(round(value * 1000) AS BIGINT) AS vm
        |  FROM events
        |), m AS (
        |  SELECT
        |    CAST(sum(CASE WHEN grp = 0 AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_a_pre,
        |    CAST(sum(CASE WHEN grp = 0 AND NOT post THEN vm ELSE 0 END) AS BIGINT) AS s_a_pre,
        |    CAST(sum(CASE WHEN grp = 0 AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_a_post,
        |    CAST(sum(CASE WHEN grp = 0 AND post THEN vm ELSE 0 END) AS BIGINT) AS s_a_post,
        |    CAST(sum(CASE WHEN grp = 1 AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_b_pre,
        |    CAST(sum(CASE WHEN grp = 1 AND NOT post THEN vm ELSE 0 END) AS BIGINT) AS s_b_pre,
        |    CAST(sum(CASE WHEN grp = 1 AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_b_post,
        |    CAST(sum(CASE WHEN grp = 1 AND post THEN vm ELSE 0 END) AS BIGINT) AS s_b_post
        |  FROM ev)
        |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
        |  CAST(s_a_pre // n_a_pre AS BIGINT) AS mean_a_pre_milli,
        |  CAST(s_a_post // n_a_post AS BIGINT) AS mean_a_post_milli,
        |  CAST(s_b_pre // n_b_pre AS BIGINT) AS mean_b_pre_milli,
        |  CAST(s_b_post // n_b_post AS BIGINT) AS mean_b_post_milli,
        |  cast(round((cast(s_b_post as double) / cast(n_b_post as double)
        |    - cast(s_b_pre as double) / cast(n_b_pre as double))
        |    - (cast(s_a_post as double) / cast(n_a_post as double)
        |    - cast(s_a_pre as double) / cast(n_a_pre as double)))
        |    as bigint) AS dd_effect_milli
        |FROM m""".stripMargin,
    "dedup_lsh_tuning" ->
      """WITH toks AS (
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
        |), sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id),
        |cfg AS (SELECT unnest([2, 4, 8]) AS bands),
        |bandsig AS (
        |  SELECT c.bands, s.id, s.seed // (16 // c.bands) AS band,
        |    string_agg(s.mh, ',' ORDER BY s.seed) AS bsig
        |  FROM sig s, cfg c
        |  GROUP BY c.bands, s.id, s.seed // (16 // c.bands)
        |), cands AS (
        |  SELECT DISTINCT a.bands, a.id AS id_a, b.id AS id_b
        |  FROM bandsig a
        |  JOIN bandsig b ON a.bands = b.bands AND a.band = b.band
        |    AND a.bsig = b.bsig AND a.id < b.id
        |  JOIN sizes sa ON sa.id = a.id
        |  JOIN sizes sb ON sb.id = b.id
        |  WHERE sa.sz * 0.1 <= sb.sz AND sb.sz * 0.1 <= sa.sz
        |), nc AS (
        |  SELECT bands, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM cands GROUP BY bands
        |), common AS (
        |  SELECT c.bands, c.id_a, c.id_b, COUNT(*) AS common
        |  FROM cands c
        |  JOIN sh a ON a.id = c.id_a
        |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY c.bands, c.id_a, c.id_b
        |), nv AS (
        |  SELECT co.bands, CAST(count(*) AS BIGINT) AS n_verified
        |  FROM common co
        |  JOIN sizes sa ON sa.id = co.id_a
        |  JOIN sizes sb ON sb.id = co.id_b
        |  WHERE CAST(co.common AS DOUBLE)
        |    / CAST(sa.sz + sb.sz - co.common AS DOUBLE) >= 0.1
        |  GROUP BY co.bands)
        |SELECT CAST(cfg.bands AS BIGINT) AS bands,
        |  CAST(16 // cfg.bands AS BIGINT) AS rows_per_band,
        |  CAST(COALESCE(nc.n_candidates, 0) AS BIGINT) AS n_candidates,
        |  CAST(COALESCE(nv.n_verified, 0) AS BIGINT) AS n_verified,
        |  CAST(COALESCE(nv.n_verified, 0) * 1000000
        |    // greatest(COALESCE(nc.n_candidates, 0), 1) AS BIGINT)
        |    AS precision_micro
        |FROM cfg LEFT JOIN nc ON cfg.bands = nc.bands
        |  LEFT JOIN nv ON cfg.bands = nv.bands
        |ORDER BY bands""".stripMargin,
    "cdc_rebalance_plan" ->
      """WITH parts AS (
        |  SELECT user_id % 32 AS partition,
        |    CAST(count(*) AS BIGINT) AS n_msgs
        |  FROM events GROUP BY 1
        |), a AS (
        |  SELECT *, partition % 4 AS w_mod,
        |    (row_number() OVER (ORDER BY n_msgs DESC, partition) - 1)
        |      % 4 AS w_striped
        |  FROM parts)
        |SELECT 'modulo' AS rule, CAST(w_mod AS BIGINT) AS worker,
        |  CAST(count(*) AS BIGINT) AS n_partitions,
        |  CAST(sum(n_msgs) AS BIGINT) AS load
        |FROM a GROUP BY w_mod
        |UNION ALL
        |SELECT 'striped', CAST(w_striped AS BIGINT),
        |  CAST(count(*) AS BIGINT), CAST(sum(n_msgs) AS BIGINT)
        |FROM a GROUP BY w_striped
        |ORDER BY rule, worker""".stripMargin,
  )
}
