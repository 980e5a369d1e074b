package graft.sinks

import graft.operators.{CdcParse, KeyedMerge}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Parquet-backed keyed table with MERGE-style apply (SURVEY.md §7.3):
  * plain Spark has no MERGE INTO over parquet, so state is rewritten as
  * `state ⟕̸ batchKeys ∪ upserts` and swapped in atomically
  * (write tmp dir -> rename). Apply is idempotent by construction,
  * which makes Structured Streaming's replay-after-failure satisfy the
  * reference's at-least-once + deferred-commit contract
  * (YqlWriter.java:181-206).
  *
  * Scale notes: the rewrite joins are key-equi joins Catalyst plans as
  * broadcast (small batch) or shuffle joins; with a lake format
  * (Delta/Iceberg) this class swaps for MERGE INTO with file-level
  * pruning — the surrounding pipeline is unchanged. State should be
  * partitioned by bucketed key ranges at large scale; for the driver
  * fixtures a flat directory suffices.
  */
class KeyedTableSink(spark: SparkSession, val path: String,
    val keys: Seq[String], val schema: StructType) {

  private val fs = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path match {
      case p if p.contains("://") => p
      case p => s"file:$p"
    }), spark.sparkContext.hadoopConfiguration)

  private def dataPath = new org.apache.hadoop.fs.Path(path, "data")

  def exists: Boolean = fs.exists(dataPath)

  def load(): DataFrame =
    if (exists) spark.read.schema(schema).parquet(dataPath.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Overwrite state atomically: write to a tmp sibling then rename
    * over the old dir (single-FS metadata op).
    */
  private def swapIn(next: DataFrame): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(path,
      s"tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    next.write.mode("overwrite").parquet(tmp.toString)
    val old = new org.apache.hadoop.fs.Path(path,
      s"old-${java.util.UUID.randomUUID().toString.take(8)}")
    if (fs.exists(dataPath)) fs.rename(dataPath, old)
    fs.rename(tmp, dataPath)
    fs.delete(old, true)
  }

  /** Apply one LWW'd batch (typed rows + `op` column) with the given
    * write action (CdcMsgParser.java:225-248 dispatch).
    */
  def apply(batch: DataFrame, action: String): Unit = {
    val state = load().cache()
    state.count() // materialize before the swap invalidates the files
    val next = action match {
      case "upsertInto" => KeyedMerge.applyUpsert(state, batch, keys)
      case "insertInto" => KeyedMerge.applyInsert(state, batch, keys)
      case "updateOn" => KeyedMerge.applyUpdateOn(state, batch, keys)
      case "deleteFrom" => KeyedMerge.applyDelete(state,
        batch.filter(org.apache.spark.sql.functions.col("op") ===
          CdcParse.OpErase), keys)
      case other =>
        throw new IllegalArgumentException(s"unknown action: $other")
    }
    swapIn(next)
    state.unpersist()
  }
}
