package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter injection: Catalyst builds a bloom filter from
  * the selective (filtered) side of a join and pushes `might_contain`
  * onto the big side's scan — rows that cannot join are dropped
  * before the shuffle. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching slice;
  * like AqeSkewSpec, the config recipe is the deliverable.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom might_contain on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-sized thresholds: fact side only needs to out-size these
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.t(spark, TestSpark.sfDir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_quantity")
      val supp = Tables.t(spark, TestSpark.sfDir, "supplier")
        .filter(col("s_acctbal") > 4500) // selective creation side
        .select("s_suppkey")
      val joined = li.join(supp,
        li("l_suppkey") === supp("s_suppkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact scan in:\n${plan.take(2000)}")
      assert(joined.count() > 0)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
