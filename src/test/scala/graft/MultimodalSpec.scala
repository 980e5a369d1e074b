package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")

  test("attachMedia: opaque binary + typed metadata struct") {
    val m = Multimodal.attachMedia(docs, "doc_id", "text")
    assert(m.schema("media").dataType.simpleString ===
      Multimodal.mediaSchema.simpleString) // ignore nullability
    val r = m.filter($"media_id" === 1L)
      .select($"media.meta.n_bytes", $"media.meta.format").head()
    assert(r.getLong(0) === 11L)
    assert(r.getString(1) === "raw/utf-8")
  }

  test("extractFeatures: batched partition-wise decode, fixed width") {
    val m = Multimodal.attachMedia(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(spark, m, featureDim = 8)
    val rows = f.collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val feat = r.getSeq[Float](1)
      assert(feat.length === 8)
      // histogram normalized by payload length -> sums to ~1
      assert(math.abs(feat.sum - 1.0f) < 1e-5)
    }
  }

  test("extractFeatures deterministic across runs") {
    val m = Multimodal.attachMedia(docs, "doc_id", "text")
    val a = Multimodal.extractFeatures(spark, m).collect().toSeq
    val b = Multimodal.extractFeatures(spark, m).collect().toSeq
    assert(a.map(_.toString) === b.map(_.toString))
  }

  test("resizeFeatures mean-pools to the smaller width") {
    val m = Multimodal.attachMedia(docs, "doc_id", "text")
    val f = Multimodal.extractFeatures(spark, m, featureDim = 8)
    val small = Multimodal.resizeFeatures(f, inDim = 8, outDim = 4)
    val r = small.filter($"media_id" === 1L).head()
    val full = r.getSeq[Float](r.fieldIndex("feature"))
    val pooled = r.getSeq[Float](r.fieldIndex("feature_small"))
    assert(pooled.length === 4)
    assert(math.abs(pooled(0) - (full(0) + full(1)) / 2) < 1e-6)
  }

  test("sampleFrames: chunked frame rows with stride") {
    val m = Multimodal.attachMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(m, frameBytes = 4, stride = 2)
      .filter($"media_id" === 1L).orderBy($"frame_no").collect()
    // 11 bytes -> 3 frames (0,1,2), stride 2 -> frames 0 and 2
    assert(frames.map(_.getInt(1)).toSeq === Seq(0, 2))
    assert(new String(frames.head.getAs[Array[Byte]](2), "UTF-8") === "hell")
  }
}
