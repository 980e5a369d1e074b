package graft

import graft.Tables.t
import graft.operators.Ext46Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the scalar-subquery / gap-audit / inter-arrival
  * batch.
  */
class Ext46OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("scalar subquery: decorrelated plan (no per-row subquery), " +
    "counts match a window-based replay") {
    val df = Ext46Queries.scalarSubquery(spark, TestSpark.sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val got = df.collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    val want = t(spark, TestSpark.sfDir, "customer")
      .select(col("c_nationkey").cast("long").as("nk"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"))
      .withColumn("avgc", expr(
        "(sum(cents) over (partition by nk)" +
          " - pmod(sum(cents) over (partition by nk)," +
          " count(1) over (partition by nk)))" +
          " div count(1) over (partition by nk)"))
      .filter(col("cents") > col("avgc"))
      .groupBy("nk").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("gap audit: totals reconcile (msgs + missing == offsets), " +
    "and a dense partition reports zero gaps") {
    val rows = Ext46Queries.gapAudit(spark, TestSpark.sfDir)
      .collect()
    val evCount = t(spark, TestSpark.sfDir, "events").count()
    val dropped = t(spark, TestSpark.sfDir, "events")
      .filter(col("event_id") % 23 === 0).count()
    assert(rows.map(_.getLong(1)).sum === evCount - dropped)
    // every gap is a dropped slot strictly inside the seen range:
    // missing <= dropped (boundary drops do not create gaps)
    assert(rows.map(_.getLong(3)).sum <= dropped)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        "gap count exceeds missing count")
      assert(r.getLong(4) <= r.getLong(3))
    }
    // replay with no drops: zero gaps everywhere
    import spark.implicits._
    val dense = (1L to 100L).map(i => (i % 4, i)).toDF("part", "off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("part").orderBy("off")
    val gaps = dense
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev", lag("rn", 1).over(w))
      .filter(col("prev").isNotNull &&
        col("rn") - col("prev") =!= 1)
      .count()
    assert(gaps === 0L)
  }

  test("interarrival: buckets are log2-exact, shares sum to ~1e6, " +
    "gap range stays inside its bucket") {
    val rows = Ext46Queries.interarrivalHist(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      // bucket b holds gaps with 2^b <= gap+1 < 2^(b+1)
      assert(mn + 1 >= (1L << b) && mx + 1 < (1L << (b + 1)),
        s"bucket $b range [$mn,$mx] out of bounds")
      assert(mn <= mx)
    }
    val total = rows.map(_.getLong(4)).sum
    assert(total > 1000000L - rows.length && total <= 1000000L)
  }
}
