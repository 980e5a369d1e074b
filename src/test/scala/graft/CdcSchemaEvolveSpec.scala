package graft

import graft.operators.{CdcParse, CdcQueries}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution across a CDC stream: envelopes written before an
  * upstream ADD COLUMN must parse under the widened reader schema
  * (missing -> null), and envelopes written after it must parse under
  * the ORIGINAL schema (unknown field ignored) — both directions of
  * the forward/backward-compatible contract, with no backlog
  * reprocessing.
  */
class CdcSchemaEvolveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val v1 = CdcParse.CdcSchema(
    StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value_milli", LongType))),
    pk = Seq("user_id"))

  private val v2 = CdcParse.CdcSchema(
    v1.columns.add(StructField("score_milli", LongType)),
    pk = Seq("user_id"))

  private val envs = Seq(
    // pre-evolution envelope: no score_milli field
    (1L, """{"key":[7],"update":{"user_id":7,"event_type":"a","value_milli":100}}"""),
    // post-evolution envelope: carries the new field
    (2L, """{"key":[8],"update":{"user_id":8,"event_type":"b","value_milli":200,"score_milli":55}}"""),
    (3L, """{"key":[7],"erase":{}}"""))

  test("widened reader: pre-evolution rows parse with null in the " +
      "added column; post-evolution rows carry the value") {
    val out = CdcParse.parseEnvelope(
        envs.toDF("seq", "env"), "env", v2)
      .select("seq", "op", "user_id", "value_milli", "score_milli")
      .orderBy("seq").collect()
    assert(out(0).getString(1) === CdcParse.OpUpdate)
    assert(out(0).isNullAt(4), "v1 envelope must yield null score")
    assert(out(1).getLong(4) === 55L)
    assert(out(2).getString(1) === CdcParse.OpErase)
  }

  test("old reader on new envelopes: the unknown field is ignored, " +
      "known fields identical to the widened reader's") {
    val oldR = CdcParse.parseEnvelope(envs.toDF("seq", "env"), "env", v1)
      .select("seq", "op", "user_id", "event_type", "value_milli")
      .orderBy("seq").collect()
    val newR = CdcParse.parseEnvelope(envs.toDF("seq", "env"), "env", v2)
      .select("seq", "op", "user_id", "event_type", "value_milli")
      .orderBy("seq").collect()
    assert(oldR.toSeq === newR.toSeq)
  }

  test("catalog query: final score_milli is null exactly when the " +
      "user's surviving write predates the evolution") {
    val out = CdcQueries.schemaEvolve(spark, TestSpark.sfDir)
    val bad = out
      .filter(col("op") === CdcParse.OpUpdate)
      .filter(
        // surviving event is post-evolution (id % 3 = 0): score must
        // equal id % 997; pre-evolution: score must be null
        when(col("event_id") % 3 === 0,
          col("score_milli").isNull ||
            col("score_milli") =!= col("event_id") % 997)
          .otherwise(col("score_milli").isNotNull))
      .count()
    assert(bad === 0L)
    // both generations must actually be represented in final state
    val gens = out.filter(col("op") === CdcParse.OpUpdate)
      .select((col("event_id") % 3 === 0).as("post"))
      .distinct().count()
    assert(gens === 2L, "expected both pre- and post-evolution rows")
  }
}
