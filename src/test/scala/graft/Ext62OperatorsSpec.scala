package graft

import graft.Tables.t
import graft.operators.Ext62Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the Poisson-bootstrap batch. */
class Ext62OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bootstrap: deterministic Poisson weights replay, CI brackets " +
    "the point estimate, weights distributed like Poisson(1)") {
    val cum = Seq(1656781714176974L, 3313563428353948L,
      4141954285442435L, 4418084571138597L, 4487117142562638L,
      4500923656847446L, 4503224742561580L)
    def u52(b: Int, id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bs:$b:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 13), 16)
    }
    def pois(u: Long): Long = {
      val i = cum.indexWhere(u < _); if (i < 0) 7L else i.toLong
    }
    val rows = t(spark, TestSpark.sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = (1 to 40).map { b =>
      val (s, n) = rows.foldLeft((0L, 0L)) { case ((s, n), (id, vm)) =>
        val w = pois(u52(b, id)); (s + w * vm, n + w)
      }
      s * 1000 / n
    }.sorted
    val row = Ext62Queries.bootstrapCi(spark, TestSpark.sfDir)
      .collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(row.getLong(1) ===
      rows.map(_._2).sum * 1000 / rows.length)
    assert(row.getLong(2) === means.head, "ci_lo")
    assert(row.getLong(3) === means.last, "ci_hi")
    assert(row.getLong(4) === 40L)
    assert(row.getLong(2) <= row.getLong(1)
      && row.getLong(1) <= row.getLong(3),
      "CI must bracket the point estimate")
    // weight distribution sanity: mean weight near 1 (Poisson(1))
    val ws = rows.flatMap(r => (1 to 40).map(b => pois(u52(b, r._1))))
    val wbar = ws.sum.toDouble / ws.length
    assert(math.abs(wbar - 1.0) < 0.05, s"mean weight $wbar")
  }
}
