package graft

import graft.Tables.t
import graft.operators.{Ext40Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the BPE-encode / 2-hop-reach / rolling-median
  * batch.
  */
class Ext40OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bpe encode: compression curve is monotone and each round " +
    "shrinks symbols by exactly that merge's frequency") {
    val rows = Ext40Queries.bpeEncode(spark, TestSpark.sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    // word types and total word count are invariant under merging
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    assert(rows.map(_.getLong(2)).distinct.length === 1)
    // weighted symbol count strictly decreases (a merge always fires
    // somewhere) and avg follows
    val syms = rows.map(_.getLong(3))
    assert(syms.sliding(2).forall(p => p(1) < p(0)), syms.toSeq)
    // each round's shrink equals the chosen pair's weighted count
    // (every non-overlapping application removes exactly one symbol)
    val train = SparkEntry.queries("tok_bpe_train3")(
      spark, TestSpark.sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    (1 to 3).foreach { r =>
      assert(syms(r - 1) - syms(r) === train(r.toLong),
        s"round $r shrink != merge frequency")
    }
  }

  test("2hop reach: reach2 >= deg, bounded by graph size, and " +
    "exact on a hand band graph") {
    val rows = Ext40Queries.twoHopReach(spark, TestSpark.sfDir)
      .collect()
    val n = rows.length // nodes with >=1 edge
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), "reach2 < deg")
      assert(r.getLong(2) <= n - 1, "reach2 exceeds graph order")
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1))
    }
    // path graph 1-2-3-4: reach2(1)={2,3}, reach2(2)={1,3,4}
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val und = pairs.unionByName(pairs.select(col("b").as("a"),
      col("a").as("b")))
    val hop2 = und.as("u1")
      .join(und.select(col("a").as("m"), col("b").as("r")).as("u2"),
        col("u1.b") === col("u2.m"))
      .filter(col("u2.r") =!= col("u1.a"))
      .select(col("u1.a").as("node"), col("u2.r").as("reach"))
      .unionByName(und.select(col("a").as("node"),
        col("b").as("reach")))
      .distinct().groupBy("node").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hop2 === Map(1L -> 2L, 2L -> 3L, 3L -> 3L, 4L -> 2L))
  }

  test("rolling median dev: med is an actual window element, dev " +
    "arithmetic exact, first 6 days excluded") {
    val rows = Ext40Queries.rollingMedianDev(spark, TestSpark.sfDir)
      .collect()
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(expr(
        "datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
        .as("day"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .groupBy("day").agg(sum("vm").as("v"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val days = daily.keys.toSeq.sorted
    assert(rows.length === days.length - 6)
    rows.foreach { r =>
      val d = r.getInt(0).toLong
      // ROWS frame: the 7 most recent observed days, not calendar
      val win = days.filter(_ <= d).takeRight(7).map(daily)
      assert(win.length === 7)
      assert(r.getLong(2) === win.sorted.apply(3), s"median at day $d")
      assert(r.getLong(3) === r.getLong(1) - r.getLong(2))
      assert(r.getBoolean(4) ===
        (math.abs(r.getLong(3)) * 2 >= r.getLong(2)))
    }
  }
}
