package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style CDC envelope adapter: `{"before":{...}|null,
  * "after":{...}|null,"op":"c|u|d|r","ts_ms":N}` mapped onto the same
  * op model as the YDB envelope (CdcParse.Op*), so everything
  * downstream (LWW, keyed merge, transforms, sinks) is shared:
  *
  *   c (create) / u (update) / r (snapshot read) -> update from `after`
  *   d (delete)                                  -> erase, keys from `before`
  *
  * Unlike the YDB format, keys are by NAME from the row images (the
  * topic key carries them in real Debezium; same information). Payload
  * objects are homogeneous, so a single from_json covers every case —
  * no fallback parse needed.
  */
object DebeziumParse {

  def envelopeSchema(columns: StructType): StructType = StructType(Seq(
    StructField("before", columns),
    StructField("after", columns),
    StructField("op", StringType),
    StructField("ts_ms", LongType)))

  /** Adds `op` (CdcParse vocabulary), `seq` (ts_ms) and one typed
    * column per table column.
    */
  def parse(df: DataFrame, envCol: String,
      schema: CdcParse.CdcSchema): DataFrame = {
    val parsed = from_json(col(envCol), envelopeSchema(schema.columns))
    val stage = df.select(col("*"), explode(array(parsed)).as("__d"))
    val d = col("__d")
    val op = when(d.isNull || d.getField("op").isNull, CdcParse.OpDrop)
      .when(d.getField("op") === "d", CdcParse.OpErase)
      .when(d.getField("op").isin("c", "u", "r") &&
        d.getField("after").isNotNull, CdcParse.OpUpdate)
      .otherwise(CdcParse.OpDrop)
    val image = when(op === CdcParse.OpErase, d.getField("before"))
      .otherwise(d.getField("after"))
    val cols = schema.columns.fieldNames.toSeq.map { n =>
      when(op === CdcParse.OpErase && !schema.pk.contains(n),
        lit(null).cast(schema.columns(n).dataType))
        .otherwise(image.getField(n)).as(n)
    }
    stage.select(((df.columns.map(col) :+ op.as("op") :+
      d.getField("ts_ms").as("seq")).toIndexedSeq ++ cols): _*)
  }
}
