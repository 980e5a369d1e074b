package graft

import graft.operators.CdcParse
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Generative envelope fuzz: the cross product of key/update/newImage/
  * erase shapes (plus malformed junk) must (a) never throw, (b) route
  * every row to the same op as the reference-semantics classifier
  * `opOf` — which exercises ONLY the slow get_json_object path — so
  * this doubles as a fast-path/slow-path consistency proof for
  * `parseEnvelope`'s hybrid decoder.
  */
class CdcParseFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val schema = CdcParse.CdcSchema(
    StructType(Seq(
      StructField("id", LongType),
      StructField("a", LongType),
      StructField("b", StringType))), Seq("id"))

  val keyParts: Seq[Option[String]] = Seq(
    Some(""""key":[3]"""), Some(""""key":[3,9]"""),
    Some(""""key":null"""), None)
  val updParts: Seq[Option[String]] = Seq(
    Some(""""update":{"a":7,"b":"x"}"""),
    Some(""""update":{}"""),
    Some(""""update":{"a":null}"""),
    Some(""""update":{"a":{"c":1}}"""),
    Some(""""update":7"""),
    Some(""""update":"s""""),
    Some(""""update":[1]"""),
    Some(""""update":null"""),
    None)
  val imgParts: Seq[Option[String]] = Seq(
    Some(""""newImage":{"a":1,"b":"y"}"""),
    Some(""""newImage":{}"""),
    Some(""""newImage":[]"""),
    Some(""""newImage":5"""),
    None)
  val ersParts: Seq[Option[String]] = Seq(Some(""""erase":{}"""), None)

  val combos: Seq[String] = for {
    k <- keyParts; u <- updParts; i <- imgParts; e <- ersParts
  } yield Seq(k, u, i, e).flatten.mkString("{", ",", "}")

  val junk = Seq("", "not json", "{", "[1,2]", "{}",
    """{"key":}""", """{"key":[1],""", "null", "7")

  test("every envelope shape parses without throwing, op matches opOf") {
    val envs = (combos ++ junk).zipWithIndex
      .map { case (e, i) => (i.toLong, e) }
    val df = envs.toDF("row_id", "value")
    val parsed = CdcParse.parseEnvelope(df, "value", schema)
      .select(col("row_id"), col("op"),
        CdcParse.opOf(col("value")).as("op_ref"))
      .collect()
    assert(parsed.length === envs.length)
    val valid = Set(CdcParse.OpUpdate, CdcParse.OpKeysOnly,
      CdcParse.OpNewImage, CdcParse.OpErase, CdcParse.OpDrop)
    parsed.foreach { r =>
      assert(valid.contains(r.getString(1)),
        s"row ${r.getLong(0)}: invalid op ${r.getString(1)}")
      assert(r.getString(1) === r.getString(2),
        s"row ${r.getLong(0)} (${envs(r.getLong(0).toInt)._2}): " +
          s"parseEnvelope=${r.getString(1)} opOf=${r.getString(2)}")
    }
    // the mix must actually exercise every route
    val ops = parsed.map(_.getString(1)).toSet
    assert(ops === valid)
  }

  test("typed assembly honors the routed payload on fuzz rows") {
    val rows = Seq(
      (1L, """{"key":[5],"update":{"a":11,"b":"u"}}"""),
      (2L, """{"key":[6],"update":3,"newImage":{"a":22,"b":"n"}}"""),
      (3L, """{"key":[7],"update":{}}"""),
      (4L, """{"key":[8],"erase":{}}"""))
    val out = CdcParse.parseEnvelope(rows.toDF("row_id", "value"),
        "value", schema)
      .orderBy("row_id")
      .select("op", "id", "a", "b").collect()
    assert(out(0).toSeq === Seq(CdcParse.OpUpdate, 5L, 11L, "u"))
    assert(out(1).toSeq === Seq(CdcParse.OpNewImage, 6L, 22L, "n"))
    assert(out(2).toSeq === Seq(CdcParse.OpKeysOnly, 7L, null, null))
    assert(out(3).toSeq === Seq(CdcParse.OpErase, 8L, null, null))
  }
}
