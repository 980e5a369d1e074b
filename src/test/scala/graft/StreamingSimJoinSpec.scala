package graft

import graft.streaming.StreamingSimJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming set-similarity join == the batch jaccard join over the
  * same rows, across micro-batches, with append-mode emission.
  */
class StreamingSimJoinSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stream-vs-corpus similarity matches batch jaccard") {
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six"),
      (102L, "alpha beta gamma delta epsilon eta"))
      .toDF("doc_id", "text")
    val streamRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "2024-01-01 00:00:10"),
      (2L, "totally unrelated words here now and then", "2024-01-01 00:00:20"),
      (3L, "one two three four five six", "2024-01-01 00:05:00"),
      // flush row: advances the watermark past every window above; too
      // short to shingle, so it can never join
      (99L, "flush", "2024-01-01 02:00:00"))
    val dir = Files.createTempDirectory("simjoin-src").toString
    streamRows.grouped(2).foreach { chunk =>
      chunk.toDF("doc_id", "text", "ts_s")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingSimJoin.streamCorpusJoin(src, corpus,
        "doc_id", "text", "ts", minJ = 0.3)
      .writeStream.outputMode("append")
      .format("memory").queryName("simjoin_out")
      .option("checkpointLocation",
        Files.createTempDirectory("simjoin-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("simjoin_out")
      .select("s_id", "c_id", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // batch truth: stream doc 1 == corpus 100 (j=1.0), overlaps 102;
    // doc 3 == corpus 101; doc 2 matches nothing
    assert(got(((1L, 100L))) === 1.0)
    assert(got(((3L, 101L))) === 1.0)
    assert(got.contains((1L, 102L))) // 3-shingle overlap of 4+4 sets
    assert(!got.keySet.exists(_._1 == 2L))
    // cross-check the overlapping pair against the batch operator
    val batchJ = graft.operators.Dedup.jaccardPairs(
      corpus.unionByName(Seq((1L, "alpha beta gamma delta epsilon zeta"))
        .toDF("doc_id", "text")),
      "doc_id", "text", minJ = 0.3)
      .filter(col("id_a") === 1L && col("id_b") === 102L)
      .select("jaccard").as[Double].head()
    assert(math.abs(got((1L, 102L)) - batchJ) < 1e-12)
  }
}
