package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions plugin path: a session built with
  * GraftExtensions resolves the graft functions from plain SQL with no
  * imperative register() call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves unwrap/vec_dot/rolling_hash") {
    val base = TestSpark.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try
      SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
    assert(s2 ne base) // a genuinely new session, extensions applied

    val r = s2.sql(
      """SELECT unwrap(123L) AS u,
        |  vec_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |          CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
        |  rolling_hash('ab') AS h""".stripMargin).head()
    assert(r.getAs[Long]("u") === 123L)
    assert(r.getAs[Double]("d") === 32.0)
    // 'a'·257 + 'b' — the documented Karp-Rabin base-257 contract
    assert(r.getAs[Long]("h") === 97L * 257L + 98L)

    // unwrap keeps its hard-fail-on-NULL semantics through this path
    val err = intercept[Exception] {
      s2.sql("SELECT unwrap(CAST(NULL AS INT)) AS u").collect()
    }
    assert(err.getMessage.toLowerCase.contains("unwrap"))
  }
}
