package graft

import graft.Tables.t
import graft.operators.Ext18Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the t-test /
  * attribution / concurrency batch: a driver-side replay of the
  * Welch statistic, per-conversion credit conservation bounds, and a
  * brute-force concurrency scan over collected session intervals.
  */
class Ext18OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Welch t replayed from collected values") {
    val vals = t(spark, TestSpark.sfDir, "events")
      .select((col("user_id") % 2).as("g"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def stats(g: Long) = {
      val xs = vals.filter(_._1 == g).map(_._2.toDouble)
      val n = xs.length
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (na, ma, va) = stats(0)
    val (nb, mb, vb) = stats(1)
    val se2 = va / na + vb / nb
    val tExp = (ma - mb) / math.sqrt(se2)
    val row = Ext18Queries.abTtest(spark, TestSpark.sfDir).head()
    assert(row.getLong(0) === na.toLong && row.getLong(1) === nb.toLong)
    // double paths differ in association order between the replay and
    // the engine formula — milli rounding must agree within 1 ulp-ish
    assert(math.abs(row.getLong(4) - math.round(tExp * 1000)) <= 1)
    val dfW = se2 * se2 /
      ((va / na) * (va / na) / (na - 1) + (vb / nb) * (vb / nb) / (nb - 1))
    assert(math.abs(row.getLong(5) - math.round(dfW * 1000)) <= 1)
    assert(row.getLong(5) >= math.min(na, nb) * 1000L - 1000,
      "Welch df below the smaller group is a formula error")
  }

  test("attribution: credits conserve per conversion (lattice floor)") {
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(Tables.eventsTsMicros).as("tsec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val touches = ev.filter(e => e._3 == "click" || e._3 == "view")
    val convs = ev.filter(_._3 == "purchase")
    val perConv = convs.map { c =>
      touches.count(tt => tt._1 == c._1 &&
        tt._4 >= c._4 - 600 && tt._4 < c._4)
    }.filter(_ > 0)
    val rows = Ext18Queries.attribTouch(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet.subsetOf(Set("click", "view")))
    assert(rows.map(_._2).sum === perConv.map(_.toLong).sum,
      "total touches must match the brute-force window count")
    val nConv = perConv.length.toLong
    // each touched conversion distributes ~1e6 micro across channels;
    // linear floor loses < n per conversion, U-shape < (n-2)
    val lin = rows.map(_._4).sum
    val ush = rows.map(_._5).sum
    assert(lin <= nConv * 1000000L && ush <= nConv * 1000000L)
    assert(lin > nConv * 1000000L - perConv.map(_.toLong).sum)
    assert(ush > nConv * 1000000L - perConv.map(_.toLong).sum)
  }

  test("peak concurrency matches a brute-force interval scan") {
    val per = graft.operators.Ext13Queries
      .sessionized(spark, TestSpark.sfDir, Seq.empty)
      .groupBy("user_id", "sess")
      .agg(min("ts").as("s"), max("ts").as("e"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // point-sampled brute force matching the sweep's tie rule: at a
    // start instant the max equals inclusive concurrency A(t); at an
    // end-only instant the running value tops out at A(t) − 1
    def dayOf(ns: Long): Int =
      ((ns / 1000L - 1704067200000000L) / 86400000000L).toInt
    def active(tq: Long): Int =
      per.count(p => p._1 <= tq && p._2 >= tq)
    val starts = per.map(_._1).toSet
    val cands = per.flatMap(p => Seq(
      (dayOf(p._1), active(p._1)),
      (dayOf(p._2),
        if (starts.contains(p._2)) active(p._2) else active(p._2) - 1)))
    val expect = cands.groupBy(_._1).view.mapValues(_.map(_._2).max)
      .toMap
    val got = Ext18Queries.peakConcurrency(spark, TestSpark.sfDir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.map(_._1).toSet === expect.keySet)
    got.foreach { case (day, nStarts, peak) =>
      assert(nStarts >= 0)
      assert(peak === expect(day).toLong,
        s"day $day: sweep $peak vs brute-force ${expect(day)}")
    }
  }
}
