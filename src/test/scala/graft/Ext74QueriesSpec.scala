package graft

import graft.operators.Ext74Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext74QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("regression metrics replay from a driver-side recompute") {
    val rows = Ext74Queries.regressionMetrics(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .selectExpr("event_id", "event_type",
        "cast(round(value * 1000) as bigint) as vm")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fit = ev.filter(_._1 % 2 == 0).groupBy(_._2)
      .map { case (et, xs) => et -> xs.map(_._3).sum / xs.size }
    rows.foreach { r =>
      val et = r.getString(0)
      val pred = fit(et)
      assert(r.getLong(2) === pred, s"pred for $et")
      val test = ev.filter(x => x._1 % 2 == 1 && x._2 == et)
        .map(_._3)
      assert(r.getLong(3) === test.size.toLong)
      val sae = test.map(v => math.abs(v - pred)).sum
      val sse = test.map(v => (v - pred) * (v - pred)).sum
      assert(r.getLong(4) === sae, s"sae for $et")
      assert(r.getLong(5) === sse, s"sse for $et")
      assert(r.getLong(6) === sae * 1000000L / test.size)
      val rmse = math.rint(
        math.sqrt(sse.toDouble / test.size) * 1e6) / 1e6
      assert(math.abs(r.getDouble(7) - rmse) < 1e-9, s"rmse for $et")
      // R² of a sane mean predictor on held-out data: bounded above
      // by 1, and NOT degenerate for this fixture
      assert(!r.isNullAt(8))
      assert(r.getDouble(8) <= 1.0)
    }
  }

  test("source KL is non-negative (Gibbs) up to per-term " +
      "quantization, and a uniform-ish fixture stays small") {
    val rows = Ext74Queries.sourceKl(spark, TestSpark.sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val types = r.getLong(2)
      // each term is rounded to the micro lattice: the exact KL is
      // >= 0, so the quantized sum is >= -types/2 micro-nats
      assert(r.getLong(3) >= -types,
        s"KL(${r.getString(0)}) broke the Gibbs bound")
    }
  }

  test("source KL: a replayed single-source divergence matches") {
    // driver replay for one source, exact same quantization
    val st = Tables.t(spark, TestSpark.sfDir, "documents")
      .select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .select(col("source"), lower(col("tok")).as("tok"))
      .groupBy("source", "tok").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val n = st.map(_._3).sum
    val cTok = st.groupBy(_._2).map { case (tk, xs) =>
      tk -> xs.map(_._3).sum }
    val src = st.map(_._1).min
    val mine = st.filter(_._1 == src)
    val nS = mine.map(_._3).sum
    val want = mine.map { case (_, tk, c) =>
      math.rint(c.toDouble / nS *
        math.log(c.toDouble * n / (nS.toDouble * cTok(tk))) * 1e6)
        .toLong
    }.sum
    val got = Ext74Queries.sourceKl(spark, TestSpark.sfDir)
      .filter(col("source") === src).head()
    assert(got.getLong(1) === nS)
    assert(got.getLong(3) === want)
  }
}
