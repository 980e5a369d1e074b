package graft.sinks

import graft.operators.{CdcParse, KeyedMerge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Parquet-backed keyed table with MERGE-style apply (SURVEY.md §7.3):
  * plain Spark has no MERGE INTO over parquet, so state is rewritten as
  * `state ⟕̸ batchKeys ∪ upserts` and swapped in atomically
  * (write tmp dir -> rename). Apply is idempotent by construction,
  * which makes Structured Streaming's replay-after-failure satisfy the
  * reference's at-least-once + deferred-commit contract
  * (YqlWriter.java:181-206).
  *
  * Scale design: with `numBuckets > 0` the state is hash-partitioned on
  * the key into `__bucket=N` directories. A batch touches only the
  * buckets its keys hash to, so the merge reads (partition-pruned) and
  * rewrites ONLY those buckets — rewrite cost is proportional to the
  * touched key space, not the table size. That is the property that
  * keeps a 100 TB materialized view maintainable; a lake format
  * (Delta/Iceberg MERGE) would drop in behind the same interface.
  * `numBuckets = 0` keeps the simple whole-table swap.
  */
class KeyedTableSink(spark: SparkSession, val path: String,
    val keys: Seq[String], val schema: StructType,
    val numBuckets: Int = 0) {

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path match {
      case p if p.contains("://") => p
      case p => s"file:$p"
    }), spark.sparkContext.hadoopConfiguration)

  private def dataPath = new org.apache.hadoop.fs.Path(path, "data")

  def exists: Boolean = fs.exists(dataPath)

  private def emptyState: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  def load(): DataFrame =
    if (!exists) emptyState
    else spark.read.schema(
        if (numBuckets > 0) schema.add("__bucket", "int") else schema)
      .parquet(dataPath.toString)
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)

  private def bucketOf = pmod(hash(keys.map(col): _*), lit(numBuckets))

  /** Load only the given buckets (partition-pruned scan). */
  private def loadBuckets(buckets: Seq[Int]): DataFrame =
    if (!exists) emptyState
    else spark.read.schema(schema.add("__bucket", "int"))
      .parquet(dataPath.toString)
      .filter(col("__bucket").isin(buckets: _*))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)

  private def freshPath(prefix: String) = new org.apache.hadoop.fs.Path(
    path, s"$prefix-${java.util.UUID.randomUUID().toString.take(8)}")

  /** Whole-table atomic swap (flat mode). */
  private def swapIn(next: DataFrame): Unit = {
    val tmp = freshPath("tmp")
    next.write.mode("overwrite").parquet(tmp.toString)
    val old = freshPath("old")
    if (fs.exists(dataPath)) fs.rename(dataPath, old)
    fs.rename(tmp, dataPath)
    fs.delete(old, true)
  }

  /** Partial swap: rewrite only the touched bucket subdirectories. */
  private def swapBuckets(next: DataFrame, buckets: Seq[Int]): Unit = {
    val tmp = freshPath("tmp")
    next.withColumn("__bucket", bucketOf)
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(tmp.toString)
    if (!fs.exists(dataPath)) fs.mkdirs(dataPath)
    buckets.foreach { b =>
      val src = new org.apache.hadoop.fs.Path(tmp, s"__bucket=$b")
      val dst = new org.apache.hadoop.fs.Path(dataPath, s"__bucket=$b")
      val old = freshPath(s"oldb$b")
      if (fs.exists(dst)) fs.rename(dst, old)
      if (fs.exists(src)) fs.rename(src, dst)
      fs.delete(old, true)
    }
    fs.delete(tmp, true)
  }

  private def merge(state: DataFrame, batch: DataFrame,
      action: String): DataFrame = action match {
    case "upsertInto" => KeyedMerge.applyUpsert(state, batch, keys)
    case "insertInto" => KeyedMerge.applyInsert(state, batch, keys)
    case "updateOn" => KeyedMerge.applyUpdateOn(state, batch, keys)
    case "deleteFrom" => KeyedMerge.applyDelete(state,
      batch.filter(col("op") === CdcParse.OpErase), keys)
    case other =>
      throw new IllegalArgumentException(s"unknown action: $other")
  }

  /** Apply one LWW'd batch (typed rows + `op` column) with the given
    * write action (CdcMsgParser.java:225-248 dispatch).
    */
  def apply(batch: DataFrame, action: String): Unit = {
    if (numBuckets <= 0) {
      val state = load().cache()
      state.count() // materialize before the swap invalidates the files
      swapIn(merge(state, batch, action))
      state.unpersist()
    } else {
      val cached = batch.cache()
      val touched = cached.select(pmod(hash(keys.map(col): _*),
          lit(numBuckets)).as("__b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (touched.nonEmpty) {
        val state = loadBuckets(touched).cache()
        state.count()
        swapBuckets(merge(state, cached, action), touched)
        state.unpersist()
      }
      cached.unpersist()
    }
  }
}
