package graft

import graft.Tables.t
import graft.operators.Ext54Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the KMV / union-by-name / Little's-law batch. */
class Ext54OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kmv: sketch-union identity (k-min of sketch union == sketch " +
    "of set union) and exact replay of theta/common/estimates") {
    val rows = Ext54Queries.kmvJaccard(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val du = t(spark, TestSpark.sfDir, "events")
      .select(expr("cast(ts div 86400000000000 as bigint)").as("day"),
        col("user_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def h(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"kmv:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.substring(0, 13), 16)
    }
    val byDay = du.groupBy(_._1).view
      .mapValues(_.map(e => h(e._2)).distinct.sorted).toMap
    rows.foreach { case (d, nd, theta, nCommon, estU, jEst, jExact) =>
      assert(nd === d + 1)
      val ka = byDay(d).take(64)
      val kb = byDay(nd).take(64)
      val uk = (ka ++ kb).distinct.sorted.take(64)
      // identity: union of sketches re-sketched == sketch of union,
      // because every union-k-min is a k-min of its own side
      val direct = (byDay(d) ++ byDay(nd)).distinct.sorted.take(64)
      assert(uk === direct, s"KMV union identity day $d")
      assert(theta === uk.max)
      assert(nCommon === uk.count(x => ka.contains(x) && kb.contains(x))
        .toLong)
      assert(estU === 63L * (1L << 52) / theta)
      assert(jEst === nCommon * 1000000L / uk.length)
      val sa = byDay(d).toSet; val sb = byDay(nd).toSet
      assert(jExact ===
        (sa & sb).size.toLong * 1000000L / (sa | sb).size)
    }
  }

  test("union by name: missing column null-fills, absent != zero, " +
    "totals conserved") {
    val rows = Ext54Queries.unionByNameEvolution(spark, TestSpark.sfDir)
      .collect()
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("cast(round(value * 1000) as bigint)").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    rows.foreach { r =>
      val g = ev(r.getString(0))
      assert(r.getLong(1) === g.length, "all rows survive the union")
      val scored = g.filter(_._1 % 3 == 0)
      assert(r.getLong(2) === scored.length, "only v2 rows scored")
      assert(r.getLong(3) === scored.map(_._1 % 997).sum)
      assert(r.getLong(4) === g.map(_._3).sum)
    }
  }

  test("littles law: boundary-sweep integral equals the session " +
    "duration sum exactly") {
    val row = Ext54Queries.littlesLaw(spark, TestSpark.sfDir)
      .collect().head
    val (n, sumDur, integral, horizon, concAvg) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4))
    assert(n > 0 && horizon > 0)
    assert(integral === sumDur,
      "∫concurrency dt must equal Σ session durations")
    assert(concAvg === integral * 1000000L / horizon)
    // replay sessionization to pin the duration sum
    val ev = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), expr("ts div 1000"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val durs = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val sessions = scala.collection.mutable.Buffer[(Long, Long)]()
      var start = ts.head; var last = ts.head
      ts.tail.foreach { t =>
        if (t - last > 1800000000L) {
          sessions += ((start, last)); start = t
        }
        last = t
      }
      sessions += ((start, last))
      sessions
    }
    assert(durs.size.toLong === n)
    assert(durs.map(s => s._2 - s._1).sum === sumDur)
  }
}
