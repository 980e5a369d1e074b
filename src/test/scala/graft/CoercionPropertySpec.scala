package graft

import graft.operators.CdcParse
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style type-coercion round-trips per SURVEY §1.2
  * (YqlQuery.java:89-166): random (seeded, reproducible) JSON values of
  * each supported type must decode to the exact Spark value. Values are
  * batched into one envelope DataFrame per type so each property is a
  * single Spark job.
  */
class CoercionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val rnd = new scala.util.Random(42)
  val N = 40

  def schemaFor(dt: DataType) = CdcParse.CdcSchema(
    StructType(Seq(StructField("id", LongType),
      StructField("v", dt))), Seq("id"))

  /** decode N json values at once; returns values ordered by id */
  def decodeAll(dt: DataType, jsonValues: Seq[String]): Seq[Any] = {
    val envs = jsonValues.zipWithIndex.map { case (j, i) =>
      s"""{"key":[$i],"update":{"v":$j}}"""
    }
    CdcParse.parseEnvelope(envs.toDF("value"), "value", schemaFor(dt))
      .orderBy("id").select("v").collect().map(_.get(0)).toSeq
  }

  test("Int64/Int32/Int16/Int8 round-trip (YqlQuery.java:110-117)") {
    val longs = Seq.fill(N)(rnd.nextLong() / 2)
    assert(decodeAll(LongType, longs.map(_.toString)) === longs)
    val ints = Seq.fill(N)(rnd.nextInt())
    assert(decodeAll(IntegerType, ints.map(_.toString)) === ints)
    val shorts = Seq.fill(N)(rnd.nextInt().toShort)
    assert(decodeAll(ShortType, shorts.map(_.toString)) === shorts)
    val bytes = Seq.fill(N)(rnd.nextInt().toByte)
    assert(decodeAll(ByteType, bytes.map(_.toString)) === bytes)
  }

  test("Double/Float round-trip (YqlQuery.java:128-131)") {
    val ds = Seq.fill(N)(rnd.nextDouble() * 2e12 - 1e12)
    assert(decodeAll(DoubleType, ds.map(_.toString)) === ds)
    val fs = Seq.fill(N)(rnd.nextFloat() * 1e6f)
    assert(decodeAll(FloatType, fs.map(_.toString)) === fs)
  }

  test("Bool round-trip (YqlQuery.java:107-108)") {
    assert(decodeAll(BooleanType, Seq("true", "false")) ===
      Seq(true, false))
  }

  test("Text round-trip (YqlQuery.java:133-134)") {
    val ss = Seq.fill(N)(rnd.alphanumeric.take(rnd.nextInt(30)).mkString)
    assert(decodeAll(StringType, ss.map("\"" + _ + "\"")) === ss)
  }

  test("Decimal(22,9) from text (YqlQuery.java:99-102)") {
    val txts = Seq.fill(N) {
      s"${rnd.nextLong() % 1000000}.${"%09d".format(rnd.nextInt(999999999))}"
    }
    val got = decodeAll(DecimalType(22, 9), txts.map("\"" + _ + "\""))
    assert(got.map(_.toString.replaceAll("0+$", "").stripSuffix(".")) ===
      txts.map(t => new java.math.BigDecimal(t).toString
        .replaceAll("0+$", "").stripSuffix(".")))
  }

  test("Bytes base64 round-trip (YqlQuery.java:137-138)") {
    val payloads = Seq.fill(N) {
      val bs = new Array[Byte](rnd.nextInt(24)); rnd.nextBytes(bs); bs
    }
    val got = decodeAll(BinaryType, payloads.map(b =>
      "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\""))
    assert(got.map(_.asInstanceOf[Array[Byte]].toSeq) ===
      payloads.map(_.toSeq))
  }

  test("Timestamp micro-precision ISO instants (YqlQuery.java:151-152)") {
    val insts = Seq.fill(N)(java.time.Instant.ofEpochSecond(
      math.abs(rnd.nextLong()) % 4102444800L, rnd.nextInt(999999) * 1000L))
    val got = decodeAll(TimestampType, insts.map(i => "\"" + i + "\""))
    assert(got.map(_.asInstanceOf[java.sql.Timestamp].toInstant) === insts)
  }

  test("Date from ISO (YqlQuery.java:146-147)") {
    val dates = Seq.fill(N)(
      java.time.LocalDate.ofEpochDay(rnd.nextInt(20000).toLong))
    val got = decodeAll(DateType, dates.map(d => "\"" + d + "\""))
    assert(got.map(_.asInstanceOf[java.sql.Date].toLocalDate) === dates)
  }

  test("null payload value -> null column (Optional, YqlQuery.java:90-97)") {
    assert(decodeAll(LongType, Seq("null")) === Seq(null))
  }

  test("Interval arrives as SECONDS, not micros (YqlQuery.java:153-154)") {
    val secs = Seq.fill(10)(rnd.nextInt(1000000).toLong)
    val got = decodeAll(DayTimeIntervalType(), secs.map(_.toString))
    assert(got.map(_.asInstanceOf[java.time.Duration].getSeconds) === secs)
  }

  test("full-range Uint64 via DecimalType(20,0) (SURVEY §7.4)") {
    val vals = Seq("18446744073709551615", "9223372036854775808", "0")
    val got = decodeAll(DecimalType(20, 0), vals)
    assert(got.map(_.toString) === vals.map(v =>
      new java.math.BigDecimal(v).toString))
  }

  test("Date from full ISO instant (YqlQuery.java:146-147)") {
    val got = decodeAll(DateType, Seq("\"2024-03-01T12:30:45Z\""))
    assert(got.head.asInstanceOf[java.sql.Date].toLocalDate.toString ===
      "2024-03-01")
  }
}
