package graft

import graft.operators.DistRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DistRank must be BIT-IDENTICAL to the single-partition global
  * window forms it replaces (row_number / ntile with no PARTITION BY)
  * — it exists purely so the same answer computes on a partitioned
  * plan at scale.
  */
class DistRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("globalRowNumber == row_number over a global window") {
    val df = spark.read
      .parquet(s"${TestSpark.sfDir}/events.parquet")
      .selectExpr("user_id", "event_id")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val want = df.withColumn("rn", row_number()
      .over(Window.orderBy(col("n").desc, col("user_id")))
      .cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = DistRank.globalRowNumber(df, "rn", 7,
      col("n").desc, col("user_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === want)
    assert(got.size > 5)
    // ranks are a permutation of 1..N
    assert(got.values.toSeq.sorted === (1L to got.size.toLong))
  }

  test("ntileFromRowNumber == SQL NTILE for every (n, k) shape") {
    // covers k | n, remainders 1..k-1, and n < k (empty small buckets)
    for (n <- Seq(1, 3, 4, 5, 10, 12, 101); k <- Seq(2, 5, 7)) {
      val df = spark.range(1, n + 1).toDF("rn")
        .withColumn("n", lit(n.toLong))
      val got = df.select(col("rn"),
        DistRank.ntileFromRowNumber(col("rn"), col("n"), k)
          .cast("int").as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val want = spark.range(1, n + 1).toDF("rn")
        .withColumn("b", ntile(k).over(Window.orderBy("rn")))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === want, s"n=$n k=$k")
    }
  }

  test("rfm quintiles survive the DistRank rewrite (vs plain ntile)") {
    val perUser = graft.Tables.t(spark, TestSpark.sfDir, "events")
      .selectExpr("user_id", "ts div 1000 as us",
        "cast(round(value * 1000) as bigint) as vm")
      .groupBy("user_id")
      .agg(max("us").as("last_us"), count(lit(1)).as("n_events"),
        sum("vm").as("sum_vm"))
    val want = perUser
      .withColumn("r", ntile(5).over(
        Window.orderBy(col("last_us").desc, col("user_id")))
        .cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val got = graft.operators.Ext11Queries
      .rfmScores(spark, TestSpark.sfDir)
      .select("user_id", "r_score")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
