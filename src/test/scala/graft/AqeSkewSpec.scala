package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: the runtime answer to key skew that
  * complements the manual salting operator (`operators/Salting`,
  * q24_salted_agg). At 100 TB a hot key lands an entire partition on
  * one task; AQE splits the oversized partition into parallel
  * sub-reads at runtime. This spec forces a skewed sort-merge join
  * under lowered thresholds and asserts the split actually happened —
  * the config recipe is the deliverable.
  */
class AqeSkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      // thresholds scaled to test-sized data; the RATIOS are what a
      // production job tunes (a partition 2x the median and over the
      // absolute floor gets split)
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 100k rows, ~90% on key 0, fat payload so bytes trip the floor
      val skewed = spark.range(100000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id"))
          .as("k"),
          concat(lit("x" * 64), col("id")).as("pay"))
      val dim = spark.range(2000)
        .select(col("id").as("k"), (col("id") * 7).as("dv"))
      val joined = skewed.join(dim, "k")
      // execute THIS plan object (count() would re-plan a derived
      // aggregate and leave joined's own adaptive plan unfinalized)
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n$plan")
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
