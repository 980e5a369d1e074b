package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 1: the three curation legs every LLM training-data
  * pipeline runs before a corpus ships.
  *
  *  - `text_contamination`: train/eval n-gram decontamination — the
  *    benchmark-leakage audit. Eval docs (every 5th source) report
  *    what share of their distinct 5-gram shingles appear ANYWHERE
  *    in the train split; a high share means the eval doc leaked
  *    into training and its benchmark score is meaningless.
  *  - `text_pii_scrub`: PII detection/redaction counts (emails,
  *    phone-shaped, IPv4-shaped) per source. The synthetic corpus
  *    carries no PII, so deterministic spans are injected in-plan
  *    for selected doc_ids (the multimodal fake-payload discipline)
  *    — the detection/redaction machinery and its oracle parity are
  *    what the query tests.
  *  - `dedup_containment_lsh`: ASYMMETRIC containment over the
  *    STORED LSH candidate pairs — common / min(|A|,|B|) catches the
  *    doc-inside-doc duplication that symmetric Jaccard dilutes
  *    (a 100-shingle doc fully embedded in a 1000-shingle doc has
  *    J = 0.1 but containment = 1.0). Ext4's `dedup_containment` is
  *    the exact shared-shingle-pairs form; this one rides the band
  *    index, so at 100 TB the candidate set is collision-bounded and
  *    the verified lattice (micro ints, not doubles) feeds the same
  *    survivorship machinery as the Jaccard family.
  *
  * 100 TB shapes: contamination is one semi-join of eval shingles
  * against the distinct train-shingle set (shuffle on the shingle
  * key; at scale the train set is a bloom-filtered bucketed table);
  * the PII scan is a narrow per-row projection (regex inside
  * whole-stage codegen, no shuffle before the per-source rollup);
  * containment re-reads the stored band-signature index — candidate
  * count is collision-bounded, never all-pairs.
  */
object Ext38Queries {

  // ---------------------------------------------------------------
  // text_contamination
  // ---------------------------------------------------------------

  private def srcNum = substring(col("source"), 4, 10).cast("int")

  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    def shingled(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        explode(array_distinct(Dedup.shingleArray(col("text"), 5)))
          .as("shingle"))
    val isEval = srcNum % 5 === 0
    val trainSet = shingled(docs.filter(!isEval))
      .select("shingle").distinct()
    val evalSh = shingled(docs.filter(isEval))
    val contam = evalSh.join(trainSet, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contam"))
    evalSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(contam, Seq("doc_id"), "left")
      .withColumn("n_contam", coalesce(col("n_contam"), lit(0L)))
      .withColumn("contam_micro",
        expr("n_contam * 1000000 div n_shingles"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------
  // text_pii_scrub
  // ---------------------------------------------------------------

  private val EmailRe = "[a-z0-9]+@[a-z]+\\.com"
  private val PhoneRe = "555-[0-9]{4}"
  private val Ipv4Re = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"

  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val aug = concat(col("text"),
      when(id % 7 === 0,
        concat(lit(" contact user"), id.cast("string"),
          lit("@example.com"))).otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" call 555-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(id % 13 === 0,
        concat(lit(" from 10."), (id % 256).cast("string"), lit("."),
          ((id * 7) % 256).cast("string"), lit("."),
          ((id * 13) % 256).cast("string"))).otherwise(lit("")))
    t(spark, dir, "documents")
      .select(col("source"), aug.as("aug"))
      .withColumn("n_email", size(regexp_extract_all(col("aug"),
        lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_phone", size(regexp_extract_all(col("aug"),
        lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("n_ipv4", size(regexp_extract_all(col("aug"),
        lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("scrubbed", regexp_replace(regexp_replace(
        regexp_replace(col("aug"), EmailRe, "<PII>"),
        PhoneRe, "<PII>"), Ipv4Re, "<PII>"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_email").as("n_emails"),
        sum("n_phone").as("n_phones"),
        sum("n_ipv4").as("n_ipv4s"),
        sum(length(col("aug")) - length(col("scrubbed")))
          .cast("long").as("chars_removed"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------
  // dedup_containment
  // ---------------------------------------------------------------

  def containment(spark: SparkSession, dir: String): DataFrame = {
    val sh = NearDupGraph.shingleTable(spark, dir)
    val cands = Dedup.lshCandidates(
      NearDupGraph.bandSig(spark, dir), NearDupGraph.MinJ)
    val szOf = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    cands
      .join(sh.select(col("id").as("id_a"), col("shingle").as("s")),
        Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle").as("s")),
        Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
      .join(szOf.select(col("id").as("id_a"), col("sz").as("sz_a")),
        "id_a")
      .join(szOf.select(col("id").as("id_b"), col("sz").as("sz_b")),
        "id_b")
      .withColumn("cont_micro",
        expr("common * 1000000 div least(sz_a, sz_b)"))
      .withColumn("jacc_micro",
        expr("common * 1000000 div (sz_a + sz_b - common)"))
      .filter(col("cont_micro") >= 600000)
      .select("id_a", "id_b", "sz_a", "sz_b", "common",
        "jacc_micro", "cont_micro")
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_contamination" -> contamination _,
    "text_pii_scrub" -> piiScrub _,
    "dedup_containment_lsh" -> containment _,
  )

  val oracle: Map[String, String] = Map(
    "text_contamination" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents
        |), sh AS (
        |  SELECT DISTINCT doc_id, source,
        |    tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
        |      || tk[i+3] || ' ' || tk[i+4] AS shingle
        |  FROM toks, UNNEST(range(1, greatest(len(tk) - 3, 1))) AS r(i)
        |), ev AS (
        |  SELECT * FROM sh
        |  WHERE CAST(substr(source, 4, 10) AS INT) % 5 = 0
        |), tr AS (
        |  SELECT DISTINCT shingle FROM sh
        |  WHERE CAST(substr(source, 4, 10) AS INT) % 5 <> 0
        |)
        |SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contam,
        |  CAST(sum(CASE WHEN tr.shingle IS NOT NULL THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS contam_micro
        |FROM ev LEFT JOIN tr ON tr.shingle = ev.shingle
        |GROUP BY ev.doc_id
        |ORDER BY ev.doc_id""".stripMargin,
    "text_pii_scrub" ->
      """WITH aug AS (
        |  SELECT source, text
        |    || CASE WHEN doc_id % 7 = 0 THEN ' contact user'
        |      || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0 THEN ' call 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |      ELSE '' END
        |    || CASE WHEN doc_id % 13 = 0 THEN ' from 10.'
        |      || CAST(doc_id % 256 AS VARCHAR) || '.'
        |      || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
        |      || CAST((doc_id * 13) % 256 AS VARCHAR) ELSE '' END
        |    AS aug
        |  FROM documents
        |), scanned AS (
        |  SELECT source, aug,
        |    len(regexp_extract_all(aug, '[a-z0-9]+@[a-z]+\.com'))
        |      AS n_email,
        |    len(regexp_extract_all(aug, '555-[0-9]{4}')) AS n_phone,
        |    len(regexp_extract_all(aug, '10\.[0-9]+\.[0-9]+\.[0-9]+'))
        |      AS n_ipv4,
        |    regexp_replace(regexp_replace(regexp_replace(aug,
        |      '[a-z0-9]+@[a-z]+\.com', '<PII>', 'g'),
        |      '555-[0-9]{4}', '<PII>', 'g'),
        |      '10\.[0-9]+\.[0-9]+\.[0-9]+', '<PII>', 'g') AS scrubbed
        |  FROM aug)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_email) AS BIGINT) AS n_emails,
        |  CAST(sum(n_phone) AS BIGINT) AS n_phones,
        |  CAST(sum(n_ipv4) AS BIGINT) AS n_ipv4s,
        |  CAST(sum(len(aug) - len(scrubbed)) AS BIGINT)
        |    AS chars_removed
        |FROM scanned GROUP BY source
        |ORDER BY source""".stripMargin,
    "dedup_containment_lsh" ->
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
        |bandsig AS (
        |  SELECT id, seed // 4 AS band,
        |    string_agg(mh, ',' ORDER BY seed) AS bsig
        |  FROM sig GROUP BY id, seed // 4
        |), cands AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bandsig a
        |  JOIN bandsig b ON a.band = b.band AND a.bsig = b.bsig
        |    AND a.id < b.id
        |  JOIN sizes sa ON sa.id = a.id
        |  JOIN sizes sb ON sb.id = b.id
        |  WHERE sa.sz * 0.1 <= sb.sz AND sb.sz * 0.1 <= sa.sz
        |), common AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS common
        |  FROM cands c
        |  JOIN sh a ON a.id = c.id_a
        |  JOIN sh b ON b.id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY c.id_a, c.id_b)
        |SELECT co.id_a, co.id_b, sa.sz AS sz_a, sb.sz AS sz_b,
        |  CAST(co.common AS BIGINT) AS common,
        |  CAST(co.common * 1000000 // (sa.sz + sb.sz - co.common)
        |    AS BIGINT) AS jacc_micro,
        |  CAST(co.common * 1000000 // least(sa.sz, sb.sz) AS BIGINT)
        |    AS cont_micro
        |FROM common co
        |JOIN sizes sa ON sa.id = co.id_a
        |JOIN sizes sb ON sb.id = co.id_b
        |WHERE co.common * 1000000 // least(sa.sz, sb.sz) >= 600000
        |ORDER BY co.id_a, co.id_b""".stripMargin,
  )
}
