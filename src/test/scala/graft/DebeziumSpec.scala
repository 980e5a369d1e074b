package graft

import graft.operators.{CdcParse, DebeziumParse}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class DebeziumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val schema = CdcParse.CdcSchema(
    StructType(Seq(StructField("id", LongType),
      StructField("name", StringType))), Seq("id"))

  def parse(env: String): Row =
    DebeziumParse.parse(Seq(env).toDF("value"), "value", schema)
      .select("op", "seq", "id", "name").head()

  test("create/update/read ops -> update from after") {
    Seq("c", "u", "r").foreach { op =>
      val r = parse(
        s"""{"before":null,"after":{"id":7,"name":"a"},"op":"$op","ts_ms":5}""")
      assert(r === Row(CdcParse.OpUpdate, 5L, 7L, "a"), op)
    }
  }

  test("delete -> erase, key from before, payload nulled") {
    val r = parse(
      """{"before":{"id":3,"name":"x"},"after":null,"op":"d","ts_ms":9}""")
    assert(r === Row(CdcParse.OpErase, 9L, 3L, null))
  }

  test("missing op or after -> dropped; malformed -> dropped") {
    assert(parse("""{"before":null,"after":{"id":1},"ts_ms":1}""")
      .getString(0) === CdcParse.OpDrop)
    assert(parse("""{"before":null,"after":null,"op":"u","ts_ms":1}""")
      .getString(0) === CdcParse.OpDrop)
    assert(parse("""garbage{{""").getString(0) === CdcParse.OpDrop)
  }
}
