package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad — simulates the driver smoke-check (plain session,
  * no graft-specific configs, calls SparkEntry.entry, expects rows>0).
  * Lives in TEST scope by design (r9 verdict hygiene note: src/main
  * carries only engine code); run via `sbt "Test/runMain graft.Scratch"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n schema=${df.schema.simpleString}")
    assert(n > 0)
    // also confirm every declared query name has either an oracle or
    // is knowingly rows-only
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    println(s"[smoke] queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size} rows-only=${noOracle.toSeq.sorted.mkString(",")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
    spark.stop()
  }
}
