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
      println(f"[scratch] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("warmup")(docs.count())
    val sh = Dedup.shingles(docs, "doc_id", "text").cache()
    time("shingles")(sh.count())
    val sig = Dedup.minhashSignatures(sh, 16)
    time("signatures")(sig.count())
    val bandSig = sig.withColumn("band", floor(col("seed") / 4))
      .groupBy(col("id"), col("band"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("seed"), col("mh")))), s => s.getField("mh")), ",")
        .as("bsig"))
    time("bandsig")(bandSig.count())
    val cands = bandSig.as("a").join(bandSig.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    time("cands")(cands.count())
    time("full")(Dedup.minhashLshPairs(docs, "doc_id", "text",
      16, 4, 0.1).count())
    spark.stop()
  }
}
