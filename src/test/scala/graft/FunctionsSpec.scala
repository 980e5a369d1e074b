package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unwrap passes non-null values through (README.md:94 semantics)") {
    GraftFunctions.register(spark)
    val out = Seq("x", "y").toDF("s")
      .select(GraftFunctions.unwrap($"s").as("u"))
      .as[String].collect().toSet
    assert(out === Set("x", "y"))
  }

  test("unwrap throws on null") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      Seq(Some("x"), None).toDF("s")
        .select(GraftFunctions.unwrap($"s")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("unwrap"))))
  }

  test("unwrap result is non-nullable in the schema") {
    GraftFunctions.register(spark)
    val df = Seq("x").toDF("s").select(GraftFunctions.unwrap($"s").as("u"))
    assert(!df.schema("u").nullable)
  }

  test("rolling_hash: deterministic, order-sensitive, codegen==eval") {
    val df = Seq("abc", "acb", "abc", "").toDF("s")
      .select(GraftFunctions.rollingHash($"s").as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) === hs(2)) // deterministic
    assert(hs(0) !== hs(1)) // order-sensitive
    assert(hs(3) === 0L)
    // reference value: h("abc") = (('a'*257)+'b')*257+'c'
    assert(hs(0) === (('a'.toLong * 257 + 'b') * 257 + 'c'))
  }

  test("morton: codegen bit-spread equals the naive interleave; SQL-registered") {
    def naive(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L)) // 70000: only low 16 bits count
    val got = pairs.toDF("a", "b")
      .select(GraftFunctions.morton($"a", $"b").as("z"))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((a, b), z) =>
      assert(z === naive(a & 65535, b & 65535))
    }
    // monotone block property: same high bytes -> same z >> 16
    assert(naive(0x1200, 0x3400) >> 16 === naive(0x12ff, 0x34ff) >> 16)
    // registry path
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT morton(3, 5)").head.getLong(0)
    assert(viaSql === naive(3, 5))
  }

  test("hilbert: d2xy roundtrip, curve continuity, codegen == SQL path") {
    // independent inverse (d2xy) — walking it back must recover d
    def d2xy(di: Long): (Long, Long) = {
      var (x, y, d) = (0L, 0L, di)
      var s = 1L
      while (s < (1L << 16)) {
        val rx = 1L & (d / 2)
        val ry = 1L & (d ^ rx)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        x += s * rx
        y += s * ry
        d /= 4
        s *= 2
      }
      (x, y)
    }
    val rnd = new scala.util.Random(7)
    val ds = Seq(0L, 1L, 2L, 3L, (1L << 32) - 1) ++
      Seq.fill(40)(math.abs(rnd.nextLong()) % (1L << 32))
    val pts = ds.map(d2xy)
    val got = pts.toDF("x", "y")
      .select(GraftFunctions.hilbert($"x", $"y").as("h"))
      .as[Long].collect()
    ds.zip(got).foreach { case (d, h) => assert(h === d, s"d=$d") }
    // continuity: consecutive indices are grid neighbours
    (0L until 1000L).sliding(2).foreach { case Seq(a, b) =>
      val (xa, ya) = d2xy(a); val (xb, yb) = d2xy(b)
      assert(math.abs(xa - xb) + math.abs(ya - yb) === 1L, s"step $a")
    }
    // registry path + high-bit masking agree with the Column path
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT hilbert(70003, 5)").head.getLong(0)
    val viaCol = Seq((70003L, 5L)).toDF("a", "b")
      .select(GraftFunctions.hilbert($"a", $"b")).head.getLong(0)
    assert(viaSql === viaCol)
  }

  test("strptime translation covers the README format") {
    // DateTime::Parse('%Y-%m-%d %H:%M:%S %Z') — README.md:91
    assert(GraftFunctions.strptimeToSpark("%Y-%m-%d %H:%M:%S %Z") ===
      "yyyy-MM-dd HH:mm:ss zz")
  }

  test("translated pattern parses with to_timestamp") {
    val fmt = GraftFunctions.strptimeToSpark("%Y-%m-%d %H:%M:%S")
    val ts = Seq("2024-05-06 07:08:09").toDF("s")
      .select(to_timestamp($"s", fmt).as("t")).head().getTimestamp(0)
    assert(ts.toInstant.toString === "2024-05-06T07:08:09Z")
  }
}
