package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for plan inspection — not part of the contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.t(spark, dir, "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("warmup")(docs.count())
    time("minhash_full")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      16, 4, 0.1).count())
    time("minhash_full2")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      16, 4, 0.1).count())
    time("jaccard")(Dedup.jaccardPairs(docs, "doc_id", "text", 0.1).count())
    spark.stop()
  }
}
