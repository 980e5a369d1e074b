package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.5): media payloads ride as
  * opaque `binary` columns next to a typed metadata struct; decode /
  * feature-extraction runs as a batched `mapPartitions` stage (the Scala
  * analogue of `mapInPandas`) so a real codec can be dropped in without
  * touching the plan shape.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (byte histogram): the Spark-side
  * plumbing — schema, partitioning, batch iteration, feature shape — is
  * real and tested.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", StringType))))))

  /** Wrap a string column as an opaque media binary + typed metadata —
    * stands in for image/audio bytes loaded from an object store.
    */
  def attachMedia(df: DataFrame, idCol: String, srcCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      struct(
        col(srcCol).cast("binary").as("payload"),
        struct(
          lit("raw/utf-8").as("format"),
          octet_length(col(srcCol)).cast("long").as("n_bytes"),
          md5(col(srcCol)).as("checksum")).as("meta")).as("media"))

  /** DECODE STUB — deterministic fake standing in for an image/audio
    * codec (none available in this container). Real deployments replace
    * the body with e.g. JPEG decode + CNN featurizer; the signature
    * (bytes -> fixed-width float vector) and the partition-batched call
    * pattern are what production code would use.
    */
  def decodeStub(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val feat = new Array[Float](featureDim)
    var i = 0
    while (i < payload.length) {
      feat(java.lang.Byte.toUnsignedInt(payload(i)) % featureDim) += 1f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    feat.map(_ / n)
  }

  /** Batched feature extraction over the media column: one stub-decode
    * per row, executed partition-at-a-time (no driver collect, no
    * shuffle). Output: (media_id, feature array<float>).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      featureDim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("feature", ArrayType(FloatType))))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("media.payload").as("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          Row(id, decodeStub(payload, featureDim).toSeq)
        }
      }(enc)
  }

  /** Resize analogue: downsample the feature vector to `outDim` by
    * mean-pooling adjacent components — the plan shape of image
    * resize (fixed-width in, smaller fixed-width out, pure map).
    */
  def resizeFeatures(features: DataFrame, inDim: Int,
      outDim: Int): DataFrame = {
    require(inDim % outDim == 0, "inDim must be a multiple of outDim")
    val k = inDim / outDim
    val pooled = transform(sequence(lit(0), lit(outDim - 1)), o =>
      (aggregate(slice(col("feature"), o * k + 1, lit(k)),
        lit(0.0f), (acc, x) => acc + x) / k).cast("float"))
    features.withColumn("feature_small", pooled)
  }

  /** Frame-sampling analogue: slice the payload into fixed-size chunks
    * and keep every `stride`-th chunk — the plan shape of video frame
    * sampling (explode to one row per sampled frame).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int,
      stride: Int): DataFrame = {
    val nFrames = ceil(col("media.meta.n_bytes") / lit(frameBytes))
      .cast("int")
    media.select(col("media_id"),
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)))
          .as("frame_no"),
        col("media.payload").as("payload"))
      .select(col("media_id"), col("frame_no"),
        col("payload").substr(col("frame_no") * frameBytes + 1,
          lit(frameBytes)).as("frame"))
  }
}
