package graft

import graft.operators.Ext79Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Ext79QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 1024
  }

  test("bloom prune: no false negatives ever; one probe's maybe-set " +
      "replays from a driver-side bloom") {
    val rows = Ext79Queries.bloomPrune(spark, TestSpark.sfDir)
      .collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      // a Bloom filter can only over-approximate
      assert(r.getLong(3) >= r.getLong(4),
        s"probe ${r.getLong(0)}: maybe < actual (false negative!)")
      assert(r.getLong(5) === r.getLong(3) - r.getLong(4))
      assert(r.getLong(3) <= r.getLong(2))
    }
    // driver replay of probe q=3
    val li = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxOk = li.map(_._1).max
    val maxPk = li.map(_._2).max
    val fileOf = (ok: Long) => ok / (maxOk / 64 + 1)
    val blooms = li.groupBy(x => fileOf(x._1)).map { case (f, xs) =>
      f -> xs.flatMap { case (_, pk) =>
        Seq(h32(s"bf1:$pk"), h32(s"bf2:$pk")) }.toSet
    }
    val pk3 = maxPk * 3 / 9
    val need = Set(h32(s"bf1:$pk3"), h32(s"bf2:$pk3"))
    val maybe = blooms.count { case (_, bits) => need.subsetOf(bits) }
    val actual = li.filter(_._2 == pk3).map(x => fileOf(x._1))
      .distinct.size
    val r3 = rows.find(_.getLong(0) == 3L).get
    assert(r3.getLong(1) === pk3)
    assert(r3.getLong(3) === maybe.toLong)
    assert(r3.getLong(4) === actual.toLong)
  }

  test("csv corrupt: malformed lines are quarantined exactly, clean " +
      "rows aggregate losslessly") {
    val rows = Ext79Queries.csvCorrupt(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000).cast("long").as("vm"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bad = rows.find(_.getString(0) == "__corrupt").get
    assert(bad.getLong(1) === ev.count(_._1 % 17 == 0).toLong)
    assert(bad.isNullAt(2))
    val clean = ev.filter(_._1 % 17 != 0)
    rows.filter(_.getString(0) != "__corrupt").foreach { r =>
      val mine = clean.filter(_._2 == r.getString(0))
      assert(r.getLong(1) === mine.size.toLong)
      assert(r.getLong(2) === mine.map(_._3).sum)
    }
    // the corruption rule actually corrupts something and spares most
    assert(bad.getLong(1) > 0)
    assert(bad.getLong(1) * 10 < ev.length)
  }
}
