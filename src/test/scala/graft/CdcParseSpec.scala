package graft

import graft.operators.CdcParse
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Envelope classification table (FIXTURES.md A4, mirrors
  * CdcMsgParser.java:45-83) + §1.2 coercions.
  */
class CdcParseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val schema = CdcParse.CdcSchema(
    StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("val", DoubleType))),
    pk = Seq("id"))

  def parse(env: String): Row =
    CdcParse.parseEnvelope(Seq(env).toDF("value"), "value", schema)
      .select("op", "id", "name", "val").head()

  test("update with full image -> update op, typed row") {
    val r = parse("""{"key":[7],"update":{"name":"a","val":1.5}}""")
    assert(r === Row(CdcParse.OpUpdate, 7L, "a", 1.5))
  }

  test("empty update object -> keys-only row, non-key columns null") {
    val r = parse("""{"key":[7],"update":{}}""")
    assert(r === Row(CdcParse.OpKeysOnly, 7L, null, null))
  }

  test("schema evolution: unknown payload columns are ignored, absent declared columns null") {
    // producer ahead of consumer: extra fields ride along harmlessly
    val ahead = parse(
      """{"key":[7],"update":{"name":"a","val":1.5,"new_col":9,"nested":{"x":1}}}""")
    assert(ahead === Row(CdcParse.OpUpdate, 7L, "a", 1.5))
    // producer behind consumer: declared-but-absent columns are null
    val behind = parse("""{"key":[7],"update":{"name":"b"}}""")
    assert(behind === Row(CdcParse.OpUpdate, 7L, "b", null))
  }

  test("non-object update + newImage -> newImage payload used") {
    val r = parse(
      """{"key":[9],"update":42,"newImage":{"name":"img","val":2.0}}""")
    assert(r === Row(CdcParse.OpNewImage, 9L, "img", 2.0))
  }

  test("erase -> delete op, keys only") {
    val r = parse("""{"key":[3],"erase":{}}""")
    assert(r === Row(CdcParse.OpErase, 3L, null, null))
  }

  test("newImage alone (no update/erase) -> dropped") {
    val r = parse("""{"key":[5],"newImage":{"name":"x","val":1.0}}""")
    assert(r.getString(0) === CdcParse.OpDrop)
  }

  test("non-object update + EMPTY newImage {} -> dropped " +
      "(CdcMsgParser.java:66-67 requires non-empty object)") {
    val r = parse("""{"key":[1],"update":7,"newImage":{}}""")
    assert(r.getString(0) === CdcParse.OpDrop)
  }

  test("non-object update + array newImage -> dropped (not an object)") {
    val r = parse("""{"key":[1],"update":7,"newImage":[1,2]}""")
    assert(r.getString(0) === CdcParse.OpDrop)
  }

  test("opOf helper matches the envelope classifier on newImage edges") {
    val df = Seq(
      """{"key":[1],"update":7,"newImage":{}}""",
      """{"key":[1],"update":7,"newImage":[3]}""",
      """{"key":[1],"update":7,"newImage":{"name":"x"}}""")
      .toDF("value")
    val ops = df.select(CdcParse.opOf(col("value")).as("op"))
      .collect().map(_.getString(0)).toSeq
    assert(ops === Seq(CdcParse.OpDrop, CdcParse.OpDrop,
      CdcParse.OpNewImage))
  }

  test("missing key -> dropped") {
    val r = parse("""{"update":{"name":"x","val":1.0}}""")
    assert(r.getString(0) === CdcParse.OpDrop)
  }

  test("malformed JSON line -> dropped, no exception (A4 case 5)") {
    val r = parse("""this is not json at {{ all""")
    assert(r.getString(0) === CdcParse.OpDrop)
  }

  test("empty line -> dropped") {
    val r = parse("")
    assert(r.getString(0) === CdcParse.OpDrop)
  }

  test("partial update: absent columns null, present coerced") {
    val r = parse("""{"key":[1],"update":{"val":3.25}}""")
    assert(r === Row(CdcParse.OpUpdate, 1L, null, 3.25))
  }

  test("Bytes columns decode base64 (YqlQuery.java:137-138)") {
    val s2 = CdcParse.CdcSchema(
      StructType(Seq(StructField("id", LongType),
        StructField("blob", BinaryType))), Seq("id"))
    val r = CdcParse.parseEnvelope(
      Seq("""{"key":[1],"update":{"blob":"aGVsbG8="}}""").toDF("value"),
      "value", s2).select("blob").head()
    assert(new String(r.getAs[Array[Byte]](0), "UTF-8") === "hello")
  }

  test("string PK extracted positionally from key array") {
    val s2 = CdcParse.CdcSchema(
      StructType(Seq(StructField("sid", StringType),
        StructField("n", LongType), StructField("v", DoubleType))),
      Seq("sid", "n")) // composite, mixed-type, positional
    val r = CdcParse.parseEnvelope(
      Seq("""{"key":["abc",12],"update":{"v":9.0}}""").toDF("value"),
      "value", s2).select("sid", "n", "v").head()
    assert(r === Row("abc", 12L, 9.0))
  }

  test("timestamp coercion from ISO-8601 (YqlQuery.java:151-152)") {
    val s2 = CdcParse.CdcSchema(
      StructType(Seq(StructField("id", LongType),
        StructField("at", TimestampType))), Seq("id"))
    val r = CdcParse.parseEnvelope(
      Seq("""{"key":[1],"update":{"at":"2024-03-01T12:30:45Z"}}""")
        .toDF("value"), "value", s2).select("at").head()
    assert(r.getTimestamp(0).toInstant.toString === "2024-03-01T12:30:45Z")
  }
}
