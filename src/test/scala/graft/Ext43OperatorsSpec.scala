package graft

import graft.Tables.t
import graft.operators.Ext43Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the disc-percentile / IQR-fence / Lorenz batch. */
class Ext43OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("percentile_disc: each quartile is an actual element and " +
    "matches the sorted-array definition") {
    val rows = Ext43Queries.percentileDisc(spark, TestSpark.sfDir)
      .collect()
    val data = t(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val xs = data(r.getString(0))
      assert(r.getLong(1) === xs.length)
      // disc: smallest element whose cume_dist >= p
      def disc(p: Double): Long =
        xs(math.max(0, math.ceil(p * xs.length).toInt - 1))
      assert(r.getLong(2) === disc(0.25))
      assert(r.getLong(3) === disc(0.5))
      assert(r.getLong(4) === disc(0.75))
      assert(xs.contains(r.getLong(3)), "median not an element")
    }
  }

  test("iqr outliers: fences bracket the quartiles, counts match " +
    "brute force on one column") {
    val rows = Ext43Queries.iqrOutliers(spark, TestSpark.sfDir)
      .collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ===
      Seq("discount_bp", "price_cents", "quantity_cents"))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "q1 > q3")
      assert(r.getLong(4) + r.getLong(5) <= r.getLong(1))
    }
    val price = t(spark, TestSpark.sfDir, "lineitem")
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    def disc(p: Double): Long =
      price(math.max(0, math.ceil(p * price.length).toInt - 1))
    val (q1, q3) = (disc(0.25), disc(0.75))
    val iqr = q3 - q1
    val pr = rows.find(_.getString(0) == "price_cents").get
    assert(pr.getLong(2) === q1 && pr.getLong(3) === q3)
    assert(pr.getLong(4) === price.count(v => 2 * v < 2 * q1 - 3 * iqr))
    assert(pr.getLong(5) === price.count(v => 2 * v > 2 * q3 + 3 * iqr))
  }

  test("lorenz: deciles partition users, cumulative share is " +
    "monotone and ends at ~1e6, curve is convex-ish") {
    val rows = Ext43Queries.lorenzCurve(spark, TestSpark.sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    val nUsers = t(spark, TestSpark.sfDir, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum === nUsers)
    // ntile balance: sizes differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    val cums = rows.map(_.getLong(4))
    assert(cums.sliding(2).forall(p => p(1) >= p(0)))
    assert(cums.last > 1000000L - 10 && cums.last <= 1000000L)
    // deciles are value-sorted: the PER-USER average is
    // non-decreasing (raw shares need not be — ntile gives the first
    // tiles the extra users when n % 10 != 0)
    val avgs = rows.map(r => (BigInt(r.getLong(2)), BigInt(r.getLong(1))))
    avgs.sliding(2).foreach { p =>
      assert(p(1)._1 * p(0)._2 >= p(0)._1 * p(1)._2,
        "per-user decile average not monotone")
    }
  }
}
