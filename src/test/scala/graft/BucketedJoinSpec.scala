package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-free co-located join via bucketed tables (the SURVEY §7.5
  * scale lever "repartition/bucketing for co-located joins"): both
  * sides bucketed on the join key -> SortMergeJoin with NO Exchange.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed saveAsTable join plans without shuffle exchanges") {
    // disable broadcast so the sort-merge path is demonstrated (the
    // test tables are tiny; at scale SMJ is what bucketing serves)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val o = Tables.t(spark, TestSpark.sfDir, "orders")
    val li = Tables.t(spark, TestSpark.sfDir, "lineitem")
    o.write.format("parquet").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    li.write.format("parquet").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not be preceded by a shuffle of either scan
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") ||
      plan.contains("SortMergeJoin"),
      s"expected SortMergeJoin in:\n$plan")
    val exchangesBeforeJoin = plan
      .linesIterator.dropWhile(!_.contains("SortMergeJoin"))
      .count(_.contains("Exchange hashpartitioning"))
    assert(exchangesBeforeJoin === 0,
      s"bucketed join should not shuffle, plan:\n$plan")
    // and results match the unbucketed join
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    assert(joined.collect().toSet === want.collect().toSet)
    spark.sql("DROP TABLE b_orders")
    spark.sql("DROP TABLE b_lineitem")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
  }
}
