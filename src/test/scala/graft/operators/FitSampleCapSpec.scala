package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The quantizer fit-sample collect must be bounded INDEPENDENT of
  * corpus size (round-6 verdict ask #4): a fixed sample mod collects a
  * fixed fraction — linear in the corpus, a driver OOM at 100 TB — so
  * `effFitMod` scales the caller's mod until the expected kept-row
  * count fits `FitSampleCap`, while staying bit-identical to the
  * fixed-mod contract at every SF the oracles run at.
  */
class FitSampleCapSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("effFitMod is the identity at oracle SFs and caps expected rows") {
    // every test/oracle corpus (500..20k vectors) keeps the caller's
    // mod exactly — the fit contract the DuckDB oracles replicate
    for (n <- Seq(500L, 2000L, 20000L, Similarity.FitSampleCap * 2))
      assert(Similarity.effFitMod(n, 2) === 2L, s"n=$n")
    // beyond that, expected kept rows n/m stay <= cap whatever n
    for (n <- Seq(1L << 20, 1L << 30, 1L << 40, 1L << 50, Long.MaxValue / 4)) {
      val m = Similarity.effFitMod(n, 2)
      assert(n / m <= Similarity.FitSampleCap, s"n=$n m=$m")
      // never more than 2x smaller than needed (doubling granularity)
      assert(n / m > Similarity.FitSampleCap / 4, s"n=$n m=$m")
      // power-of-2 multiple of the base mod: divides the 48-bit hash
      // bucket space exactly, so the keep rate is unbiased
      assert(java.lang.Long.bitCount(m) === 1, s"m=$m")
    }
  }

  test("cap-scaled keeps are NESTED: mod 2m selects a subset of mod m") {
    import spark.implicits._
    val ids = spark.range(0, 20000).select(col("id"))
    def kept(m: Long): Set[Long] =
      ids.filter(Similarity.fitKeep(col("id"), m))
        .as[Long].collect().toSet
    // across the 2-digit/12-digit boundary each doubling only ever
    // SHRINKS the kept set — growing the corpus shrinks the sample
    // fraction deterministically, never reshuffles which ids qualify
    val chain = Seq(2L, 4L, 8L, 512L, 1024L).map(kept)
    chain.sliding(2).foreach { case Seq(a, b) =>
      assert(b.subsetOf(a), s"sizes ${a.size} -> ${b.size}")
    }
    // and the rates stay near 1/m (md5 uniformity sanity)
    val k1024 = chain.last.size
    assert(k1024 > 5 && k1024 < 60, s"20000/1024 ~ 19.5, got $k1024")
  }

  test("fitSample collect is bounded on a corpus above the cap") {
    // 300k one-dim vectors: a fixed mod 2 would collect ~150k rows;
    // the capped sampler must keep the collect at <= ~cap rows and
    // stay deterministic (same sample on re-run)
    val corpus = spark.range(0, 300000)
      .select(col("id").as("vec_id"),
        array(col("id").cast("float")).as("embedding"))
    val s1 = Similarity.fitSample(corpus, "vec_id", "embedding", 2)
    val s2 = Similarity.fitSample(corpus, "vec_id", "embedding", 2)
    assert(s1.length <= Similarity.FitSampleCap * 12 / 10,
      s"collected ${s1.length}")
    assert(s1.length >= Similarity.FitSampleCap / 4,
      s"collected ${s1.length}")
    assert(s1.map(_._1).toSeq === s2.map(_._1).toSeq)
    // sorted by id, as the Lloyd init contract requires
    assert(s1.map(_._1).toSeq === s1.map(_._1).sorted.toSeq)
  }
}
