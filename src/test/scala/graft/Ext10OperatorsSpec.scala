package graft

import graft.operators.Ext10Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 3 invariants the hash-compare cannot see: the hashed
  * classifier agrees with a from-scratch driver recount, DSIR actually
  * enriches the target language in its selection, and the Kneser-Ney
  * table is a (sub-stochastic) probability distribution per history
  * with the held-out mass exactly the discount.
  */
class Ext10OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  test("quality model score matches a from-scratch driver recount") {
    val out = Ext10Queries.qualityModel(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val docs = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text").collect()
    assert(out.size === docs.length)
    docs.take(20).foreach { r =>
      val toks = r.getString(1).trim.split("\\s+").map(_.toLowerCase)
      val score = toks.map(t => h60("qw:" + t) % 2001 - 1000).sum
      val (n, s, keep) = out(r.getLong(0))
      assert(n === toks.length.toLong, s"doc ${r.getLong(0)}")
      assert(s === score, s"doc ${r.getLong(0)}")
      assert(keep === (score >= 0))
    }
  }

  test("dsir selection enriches the target language beyond its " +
      "corpus share") {
    val docs = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val corpusEn =
      langOf.values.count(_ == "en").toDouble / langOf.size
    val scorable = docs.select("text").collect()
      .count(_.getString(0).trim.split("\\s+").length >= 2)
    val sel = Ext10Queries.dsirSelect(spark, TestSpark.sfDir).collect()
    assert(sel.length === math.min(100, scorable))
    // selection order is total (weight desc, id): weights decrease
    val ws = sel.map(_.getLong(2))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    val selEn = sel.count(r => langOf(r.getLong(0)) == "en")
      .toDouble / sel.length
    // the LLR scorer is fit target-vs-raw on these very docs, so the
    // top slice must over-represent the target language
    assert(selEn > corpusEn,
      s"selected en share $selEn <= corpus share $corpusEn")
  }

  test("kneser-ney: probabilities valid, top row matches a driver " +
      "recount, and per-history mass + unseen reserve = 1") {
    val top = Ext10Queries.knBigram(spark, TestSpark.sfDir).collect()
    assert(top.nonEmpty && top.length <= 50)
    assert(top.forall { r =>
      val p = r.getLong(3); p > 0 && p <= 1000000L
    })
    // driver-side LM recount
    val texts = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val tk = t.trim.split("\\s+").map(_.toLowerCase)
      tk.zip(tk.drop(1))
    }
    val c12 = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1Fwd = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val n1Bwd = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    val nb = c12.size.toLong
    def pMicro(w1: String, w2: String): Long = {
      val num = (4 * c12((w1, w2)) - 3) * nb + 3 * n1Fwd(w1) * n1Bwd(w2)
      num * 1000000L / (4 * c1(w1) * nb)
    }
    val h = top.head
    assert(h.getLong(3) === pMicro(h.getString(0), h.getString(1)))
    // mass check on the history with the most continuations: the sum
    // of exact (un-floored) P over OBSERVED w2 equals
    // 1 - (3/4)·N1+(w1·)/c1 · (1 - sum of observed Pcont) ... i.e. all
    // mass not reserved for unseen continuations. Verify with exact
    // rationals: sum over observed w2 of num(w1,w2) must equal
    // den·(1) - reserve, where reserve = 3·N1fw·(nb - sum n1Bwd)·... —
    // equivalently check sum(num) == 4·c1·nb - 3·N1fw·(nb - Σ n1Bwd).
    val w1Top = n1Fwd.maxBy(x => (x._2, x._1))._1
    val obs = c12.keys.filter(_._1 == w1Top).map(_._2).toSeq
    val sumNum = obs.map(w2 =>
      BigInt((4 * c12((w1Top, w2)) - 3) * nb + 3 * n1Fwd(w1Top) * n1Bwd(w2))).sum
    val reserve = BigInt(3) * n1Fwd(w1Top) *
      (BigInt(nb) - obs.map(w2 => BigInt(n1Bwd(w2))).sum)
    assert(sumNum + reserve === BigInt(4) * c1(w1Top) * nb,
      s"KN mass identity failed for history '$w1Top'")
  }

  test("pca projection equals lattice dot of embedding with the " +
      "published component") {
    val v = graft.operators.Ext9Queries
      .pcaPower(spark, TestSpark.sfDir)
      .orderBy("dim").collect().map(_.getLong(1))
    val proj = graft.operators.Ext9Queries
      .pcaProject(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val sample = spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").limit(25).collect()
    assert(proj.nonEmpty)
    sample.foreach { r =>
      val m = r.getSeq[Float](1)
        .map(x => math.round(x.toDouble * 1e6)).toArray
      val expect = m.zip(v).map { case (a, b) => a * b }.sum
      assert(proj(r.getLong(0)) === expect, s"vec ${r.getLong(0)}")
    }
  }

  test("hard negatives: cross-label only, dense ranks, and the top " +
      "negative beats every other cross-label candidate") {
    val rows = Ext10Queries.hardNegatives(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) != r.getInt(3)),
      "a negative shares the anchor's label")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(5)).sorted.toSeq === (1 to rs.length),
        s"ranks not dense for anchor $q")
    }
    // exhaustive driver check for one anchor
    val all = spark.read
      .parquet(s"${TestSpark.sfDir}/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val (qId, qLabel, qVec) = all.find(_._1 % 50 == 0).get
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      math.rint(r * 1e6) / 1e6
    }
    val bestSim = all.filter(_._2 != qLabel).map(c => cos(qVec, c._3)).max
    val got = rows.filter(r => r.getLong(0) == qId && r.getInt(5) == 1)
      .head.getDouble(4)
    assert(math.abs(got - bestSim) < 2e-6,
      s"top negative $got vs exhaustive best $bestSim for anchor $qId")
  }

  test("lang confusion: cells sum to the corpus, shares normalize " +
      "per declared language") {
    val cm = Ext10Queries.langConfusion(spark, TestSpark.sfDir)
      .collect()
    val nDocs = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet").count()
    assert(cm.map(_.getLong(2)).sum === nDocs)
    cm.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val sSum = rs.map(_.getLong(3)).sum
      assert(sSum <= 1000000L && sSum > 1000000L - rs.length,
        s"$lang share sum $sSum")
    }
    // predictions are only ever en/es/unk (the heuristic's codomain)
    assert(cm.map(_.getString(1)).toSet.subsetOf(Set("en", "es", "unk")))
  }

  test("curate pipeline: every pick passed the quality gate, per-lang " +
      "cap respected, weights descend within language") {
    val picks = Ext10Queries.curatePipeline(spark, TestSpark.sfDir)
      .collect()
    assert(picks.nonEmpty)
    val kept = Ext10Queries.qualityModel(spark, TestSpark.sfDir)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(picks.forall(r => kept(r.getLong(0))),
      "a selected doc failed the quality gate")
    picks.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      assert(rs.length <= 10, s"$lang over cap")
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq === (1 to rs.length),
        s"$lang ranks not dense")
      val ws = sorted.map(_.getLong(2))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
        s"$lang weights not descending")
    }
  }
}
