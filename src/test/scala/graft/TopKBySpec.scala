package graft

import graft.functions.TopKBy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKBySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bounded heap: top-k desc with id tie-break, cross-partition merge") {
    val df = (1L to 1000L).map(i => ("g" + (i % 3), (i % 100).toDouble, i))
      .toDF("g", "ord", "id").repartition(8)
    val got = df.groupBy($"g")
      .agg(TopKBy.topkBy($"ord", $"id", 4).as("top"))
      .select($"g", explode($"top").as("e"))
      .select($"g", $"e.ord", $"e.id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = (1L to 1000L).map(i => ("g" + (i % 3), (i % 100).toDouble, i))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy { case (_, o, i) => (-o, i) }.take(4)
      }.toSet
    assert(got.toSet === want)
    assert(got.length === 12)
  }

  test("k larger than group returns whole group sorted") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L))
      .toDF("g", "ord", "id")
    val got = df.groupBy($"g")
      .agg(TopKBy.topkBy($"ord", $"id", 10).as("top"))
      .select(explode($"top").as("e")).select($"e.id")
      .as[Long].collect().toSeq
    assert(got === Seq(2L, 3L, 1L))
  }

  test("nulls in ord are skipped") {
    val df = Seq(("a", Some(1.0), 1L), ("a", None, 2L), ("a", Some(2.0), 3L))
      .toDF("g", "ord", "id")
    val got = df.groupBy($"g")
      .agg(TopKBy.topkBy($"ord", $"id", 5).as("top"))
      .select(size($"top")).as[Int].head()
    assert(got === 2)
  }
}
