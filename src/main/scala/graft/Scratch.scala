package graft

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
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val ev = Tables.t(spark, dir, "events")
    time("warmup")(ev.count())
    time("scan+project")(ev.select(col("event_id"), col("user_id")).count())
    // reproduce CdcQueries envelope construction
    val vm = round(col("value") * 1000).cast("long")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val payload = concat(lit("{\"user_id\":"), s(col("user_id")),
      lit(",\"event_type\":\""), col("event_type"),
      lit("\",\"value_milli\":"), s(vm), lit("}"))
    val keyPart = concat(lit("{\"key\":["), s(col("user_id")), lit("]"))
    val sel = col("event_id") % 10
    val env = when(sel === 0, concat(keyPart, lit(",\"erase\":{}}")))
      .when(sel === 1, concat(keyPart, lit(",\"update\":{}}")))
      .otherwise(concat(keyPart, lit(",\"update\":"), payload, lit("}")))
    val envDf = ev.select(col("event_id"), env.as("env"))
    time("construct")(envDf.select(length(col("env"))).filter(col("length(env)") > 0).count())
    import graft.operators.{CdcParse, KeyedMerge}
    import org.apache.spark.sql.types._
    val schema = CdcParse.CdcSchema(StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value_milli", LongType))), Seq("user_id"))
    val parsed = CdcParse.parseEnvelope(envDf, "env", schema)
    time("construct+parse")(parsed.select(col("op")).count())
    time("parse+filter+proj")(parsed.filter(col("op") =!= "drop")
      .select("event_id","op","user_id","event_type","value_milli").count())
    val lww = KeyedMerge.lww(parsed.filter(col("op") =!= "drop"), Seq("user_id"), "event_id")
    time("parse+lww")(lww.count())
    time("parse+lww2")(lww.count())
    spark.stop()
  }
}
