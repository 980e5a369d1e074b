package graft

import graft.operators.{AsOf, RangeJoin}
import org.scalatest.funsuite.AnyFunSuite

/** Edge semantics of the as-of and interval joins (the oracle suite
  * proves bulk equality; these pin the boundary rules).
  */
class AsOfRangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof: <= boundary, carry-forward, null before first right row") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 5L, 103L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L), (1L, 25L, 8L))
      .toDF("k", "t", "rid")
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", "t", Seq("rid"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(100L) === 7L)  // equal time matches (<=)
    assert(out(101L) === 7L)  // carried forward
    assert(out(102L) === 8L)  // superseded by later right row
    assert(out(103L) === -1L) // key with no right rows -> null
  }

  test("asof forward: >= boundary, carry-backward, null after last " +
      "right row, and time-negation duality with backward asof") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
      (2L, 5L, 103L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L), (1L, 25L, 8L))
      .toDF("k", "t", "rid")
    val out = AsOf.asofJoinForward(left, right, Seq("k"), "t", "t",
        Seq("rid"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out(100L) === 7L)  // equal time matches (>=)
    assert(out(101L) === 8L)  // next right row ahead
    assert(out(102L) === -1L) // nothing ahead -> null
    assert(out(103L) === -1L) // key with no right rows -> null
    // duality: forward == backward on negated time
    import org.apache.spark.sql.functions.{col, negate}
    val viaNeg = AsOf.asofJoin(
        left.withColumn("t", negate(col("t"))),
        right.withColumn("t", negate(col("t"))),
        Seq("k"), "t", "t", Seq("rid"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(viaNeg === out)
  }

  test("interval join: boundary == window included, both orientations") {
    // ids chosen so the later event has the SMALLER id — the
    // orientation that the old pre-normalization filter dropped
    val ev = Seq((1L, 99L, 1000L), (1L, 5L, 1300L), (1L, 50L, 1601L))
      .toDF("k", "id", "t")
    val pairs = RangeJoin.withinInterval(ev, Seq("k"), "t", "id", 300L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // (99@1000, 5@1300): dt exactly 300 -> included; pair (5,99), dt
    // = t(99) - t(5) = -300
    assert(pairs.contains((5L, 99L, -300L)))
    // (5@1300, 50@1601): dt 301 -> excluded
    assert(!pairs.exists(p => p._1 == 5L && p._2 == 50L))
    // (99@1000, 50@1601): dt 601 -> excluded
    assert(pairs.size === 1)
  }
}
