package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: `runMain graft.QBench <sfDir> <query>...`
  * — same session shape as Bench, prints per-query cold + warm seconds.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf, same rationale as Bench: don't let the 100-entry
      // codegen class cache bill recompilation to the warm run
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      // cold means cold: no plan cache or memoized fit from a
      // previous query in the same process
      spark.catalog.clearCache()
      graft.operators.Ext9Queries.clearFitCache()
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"[qbench] $name cold=$cold%.2fs warm=$warm%.2fs")
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")))
    }
    spark.stop()
  }
}
