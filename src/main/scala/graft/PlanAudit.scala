package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints the physical-plan properties that matter at
  * scale (pushdown, pruning, broadcast, top-k, codegen spans) for the
  * headline queries. Run: `sbt "runMain graft.PlanAudit"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val interesting = args.headOption.map(Seq(_)).getOrElse(Seq(
      "q2_filter_project", "q4_broadcast_join", "q6_topk",
      "q1_pricing_summary", "sim_cosine_topk", "q33_range_frame",
      "q34_scalar_subquery", "text_tfidf", "text_bloom_decontaminate",
      "text_pack_sequences", "q47_asof_planned", "graph_pagerank",
      "layout_zorder", "text_bm25_topk", "sketch_cms",
      "dedup_paragraphs"))
    interesting.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      println(s"\n===== $name =====")
      plan.linesIterator.foreach { l =>
        val t = l.trim
        if (t.contains("PushedFilters") || t.contains("ReadSchema") ||
            t.contains("Join") || t.contains("TakeOrdered") ||
            t.contains("Exchange") || t.startsWith("*")) {
          println("  " + t.take(240))
        }
      }
    }
    spark.stop()
  }
}
