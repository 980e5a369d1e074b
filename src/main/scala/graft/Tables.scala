package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table access for the driver-generated parquet star schema
  * (see TESTDATA.md). One parquet file per table under `dir`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** Restore the repo-wide `events.ts`-as-nanos-epoch-long contract
    * regardless of how the generator encoded it. Early testdata used
    * parquet TIMESTAMP(NANOS), which `nanosAsLong=true` surfaces as a
    * nanos BIGINT — the contract every query/oracle pair was built on
    * (the DuckDB oracles read the SAME file and use `epoch_us(ts)` /
    * `CAST(ts AS DATE)`, which are encoding-invariant). Regenerated
    * testdata uses TIMESTAMP(MICROS) NTZ; sessions pin UTC, so
    * NTZ→instant is a fixed offset-free reinterpretation and the
    * nanos-long values come out identical to the old encoding.
    */
  private def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) via nanosAsLong — as-built
      case TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other")
    }

  /** `ts` carries nanos-since-epoch as a long (see
    * [[normalizeEventsTs]]); this converts to a proper (microsecond)
    * TimestampType column.
    */
  def eventsTsMicros: Column =
    timestamp_micros(expr("ts div 1000"))

  /** Register every table as a temp view so `spark.sql` can address them
    * by name — mirrors the reference's `AS_TABLE($rows)` relation binding
    * (YqlQuery.java:220) generalized to the whole catalog. Memoized per
    * (session, dir): a long-running engine registers its catalog once,
    * not per query (10 parquet footer reads otherwise).
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val key = "graft.registered.dir"
    if (spark.conf.getOption(key).contains(dir)) return
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
    spark.conf.set(key, dir)
  }
}
