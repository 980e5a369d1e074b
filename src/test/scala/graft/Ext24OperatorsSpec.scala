package graft

import graft.Tables.t
import graft.operators.{Ext24Queries, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants the hash-compare cannot see for the markov-backtest /
  * bucket-stats batch: a driver-side replay of the temporal split +
  * argmax scoring, and occupancy/candidate-mass identities.
  */
class Ext24OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("markov accuracy replays from collected transitions") {
    val pairs = t(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"),
        expr("datediff(timestamp_micros(ts div 1000), date'2024-01-01')")
          .as("day"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getInt(4)))
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        val s = rows.sortBy(r => (r._2, r._3))
        s.zip(s.drop(1)).map(p => (p._1._4, p._2._4, p._1._5))
      }
    val train = pairs.filter(_._3 < 20)
      .groupBy(p => (p._1, p._2)).view.mapValues(_.size).toMap
    val pred = train.keys.map(_._1).toSeq.distinct.map { c =>
      c -> train.collect { case ((`c`, n), cnt) => (n, cnt) }
        .toSeq.minBy(x => (-x._2, x._1))._1
    }.toMap
    val test = pairs.filter(_._3 >= 20)
    val expect = test.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (c, ts) =>
        val correct = ts.count(p => pred.get(c).contains(p._2)).toLong
        (c, ts.size.toLong, correct, pred.get(c).orNull,
          correct * 1000000L / ts.size)
    }
    val got = Ext24Queries.markovAcc(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq === expect)
    assert(got.nonEmpty)
  }

  test("bucket stats: occupancy and candidate-mass identities") {
    val buckets = t(spark, TestSpark.sfDir, "embeddings")
      .select(Similarity.srpBucket(col("embedding"), 6, 64).as("b"))
      .collect().map(_.getString(0))
    val occ = buckets.groupBy(identity).view.mapValues(_.length).toMap
    val rows = Ext24Queries.bucketStats(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.map(_._3).sum === buckets.length.toLong)
    assert(rows.map(_._2).sum === occ.size.toLong)
    val mass = occ.values.map(s => s.toLong * (s - 1) / 2).sum
    assert(rows.map(_._4).sum === mass)
    rows.foreach { case (sz, nb, nv, pc) =>
      assert(nv === sz * nb)
      assert(pc === nb * (sz * (sz - 1) / 2))
    }
  }
}
