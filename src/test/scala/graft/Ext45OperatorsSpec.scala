package graft

import graft.Tables.t
import graft.operators.Ext45Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Format-roundtrip invariants: each non-parquet format must carry
  * the full changelog projection losslessly, and all three formats
  * must agree with the parquet source AND each other.
  */
class Ext45OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val want = t(spark, TestSpark.sfDir, "events")
    .select(col("event_type"),
      round(col("value") * 1000).cast("long").as("vm"),
      col("user_id"))
    .groupBy("event_type")
    .agg(count(lit(1)).as("n"), sum("vm").as("s"),
      countDistinct(col("user_id")).as("u"),
      min("vm").as("mn"), max("vm").as("mx"))
    .collect()
    .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = df.collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val w = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)) === w,
        s"roundtrip diverged for ${r.getString(0)}")
    }
  }

  test("csv roundtrip is lossless vs the parquet source") {
    check(Ext45Queries.csvRoundtrip(spark, TestSpark.sfDir))
  }

  test("jsonl roundtrip is lossless vs the parquet source") {
    check(Ext45Queries.jsonlRoundtrip(spark, TestSpark.sfDir))
  }

  test("xml roundtrip (Spark 4 native source) is lossless vs the " +
    "parquet source") {
    check(Ext45Queries.xmlRoundtrip(spark, TestSpark.sfDir))
  }

  test("orc roundtrip is lossless vs the parquet source, and the " +
    "orc scan prunes columns") {
    check(Ext45Queries.orcRoundtrip(spark, TestSpark.sfDir))
    val plan = Ext45Queries.orcRoundtrip(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("orc") || plan.toLowerCase.contains("orc"),
      "plan does not show an ORC scan")
  }
}
