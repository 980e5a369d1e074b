package graft

import graft.Tables.t
import graft.operators.{Ext27Queries, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the curation/experimentation batch: rule-battery
  * accounting + a driver-side replay of every rule on a sample,
  * CUPED algebraic identities, and dataset-card conservation.
  */
class Ext27OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("gopher rules: accounting, and a full driver-side replay") {
    val rows = Ext27Queries.gopherRules(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    val nDocs = t(spark, TestSpark.sfDir, "documents").count()
    assert(rows.map(_._2).sum === nDocs)
    rows.foreach { case (_, n, wc, mwl, stop, dup, all, rate) =>
      assert(all <= Seq(wc, mwl, stop, dup).min)
      assert(Seq(wc, mwl, stop, dup).forall(p => p >= 0 && p <= n))
      assert(rate === all * 1000000L / n)
    }
    // the battery must actually discriminate on the fixture corpus —
    // a rule set that passes or fails everything tests nothing
    val total = rows.map(_._2).sum
    val passAll = rows.map(_._7).sum
    assert(passAll > 0 && passAll < total,
      s"rule battery is inert: $passAll of $total pass")

    // independent per-doc replay on the driver
    val stop = TextAnalysis.enStopwords.toSet
    val docs = t(spark, TestSpark.sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val flags = ds.map { case (_, text) =>
        val tk = text.trim.split("\\s+").toSeq
        val wc = tk.length.toLong
        val alpha = tk.map(_.length.toLong).sum
        val nStop = tk.map(_.toLowerCase).distinct.count(stop)
        val dist = tk.distinct.length.toLong
        (wc >= 25 && wc <= 80,
          alpha >= wc * 3 && alpha <= wc * 10,
          nStop >= 2,
          wc * 40 <= dist * 100)
      }
      src -> (flags.count(_._1).toLong, flags.count(_._2).toLong,
        flags.count(_._3).toLong, flags.count(_._4).toLong,
        flags.count(f => f._1 && f._2 && f._3 && f._4).toLong)
    }
    rows.foreach { case (src, _, wc, mwl, st, dup, all, _) =>
      assert(expect(src) === ((wc, mwl, st, dup, all)),
        s"rule replay mismatch for $src")
    }
  }

  test("cuped: split accounting and the adjustment identity") {
    val r = Ext27Queries.abCuped(spark, TestSpark.sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    val (n, nA, nB) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(nA + nB === n)
    val varRed = row.getLong(6)
    assert(varRed >= 0 && varRed <= 1000000L,
      s"corr^2 must be a [0,1] micro value, got $varRed")
    // identity: effect_cuped = effect_raw - theta * (mean_xB - mean_xA)
    // — recompute the pieces independently from the per-user table
    val cut = 1705363200L
    val pu = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"),
        unix_timestamp(graft.Tables.eventsTsMicros).as("tsec"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("user_id")
      .agg(sum(when(col("tsec") < cut, col("vm")).otherwise(0L)).as("x"),
        sum(when(col("tsec") >= cut, col("vm")).otherwise(0L)).as("y"))
      .withColumn("grp", col("user_id") % 2)
      .collect().map(r2 => (r2.getLong(3), r2.getLong(1), r2.getLong(2)))
    val a = pu.filter(_._1 == 0L); val b = pu.filter(_._1 == 1L)
    def mean(v: Seq[Long]) = v.sum.toDouble / v.size
    val xs = pu.map(_._2).toSeq; val ys = pu.map(_._3).toSeq
    val nn = pu.length.toDouble
    val cov = nn * xs.zip(ys).map { case (p, q) => p.toDouble * q }.sum -
      xs.map(_.toDouble).sum * ys.map(_.toDouble).sum
    val vx = nn * xs.map(v => v.toDouble * v).sum -
      math.pow(xs.map(_.toDouble).sum, 2)
    val theta = cov / vx
    val effRaw = mean(b.map(_._3).toSeq) - mean(a.map(_._3).toSeq)
    val effAdj = effRaw -
      theta * (mean(b.map(_._2).toSeq) - mean(a.map(_._2).toSeq))
    assert(math.abs(row.getLong(4) - effRaw) <= 1.0)
    assert(math.abs(row.getLong(5) - effAdj) <= 1.0)
    assert(math.abs(row.getLong(3) - theta * 1e6) <= 1.0)
    // CUPED must not move the point estimate's sign arbitrarily:
    // |adjusted - raw| is bounded by |theta| * |mean_x gap|
    val bound = math.abs(theta) *
      math.abs(mean(b.map(_._2).toSeq) - mean(a.map(_._2).toSeq)) + 1.0
    assert(math.abs(row.getLong(5) - row.getLong(4)) <= bound)
  }

  test("dataset card: conservation against the raw table") {
    val rows = Ext27Queries.datasetCard(spark, TestSpark.sfDir).collect()
    val docs = t(spark, TestSpark.sfDir, "documents")
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val langTotal = docs.select("source", "lang").distinct().count()
    assert(rows.map(_.getLong(4)).sum === langTotal)
    rows.foreach { r =>
      val (n, nTok, minT, maxT) =
        (r.getLong(1), r.getLong(2), r.getLong(5), r.getLong(6))
      assert(minT <= maxT)
      assert(nTok >= n * minT && nTok <= n * maxT)
      assert(r.getLong(7) === nTok * 1000L / n)
      val share = r.getLong(9)
      // dominant language: share at least 1/n_langs, at most 100%
      assert(share <= 1000000L)
      assert(share * r.getLong(4) >= 1000000L - r.getLong(4))
      assert(r.getString(8).nonEmpty)
    }
  }
}
