package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-generated parquet star schema
  * (see TESTDATA.md). One parquet file per table under `dir`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS): with
    * spark.sql.legacy.parquet.nanosAsLong=true it surfaces as a nanos
    * long; this converts to a proper (microsecond) TimestampType column.
    */
  def eventsTsMicros: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    timestamp_micros(expr("ts div 1000"))
  }

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
