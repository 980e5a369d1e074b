package graft

import graft.plans.PlannedAsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The planned (logical node + Strategy + physical merge) as-of join:
  * semantics vs the union+carry-forward formulation, edge cases, and
  * the plan-shape property that justifies its existence.
  */
class PlannedAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("planned as-of == union-carry-forward on the events fixture") {
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("vts"),
        col("value").as("vv"))
    val planned = PlannedAsOf.asofJoin(clicks, views, "user_id",
        "ts_us", "vts", Seq("vts", "vv"))
      .select("user_id", "event_id", "vts", "vv")
      .collect().map(_.toSeq).toSet
    val union = graft.operators.AsOf.asofJoin(clicks, views,
        Seq("user_id"), "ts_us", "vts", Seq("vts", "vv"))
      .select("user_id", "event_id", "vts", "vv")
      .collect().map(_.toSeq).toSet
    assert(planned.nonEmpty)
    assert(planned === union)
  }

  test("edge cases: <= tie, no-match null, carry across left rows") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 25L, "l3"),
      (2L, 5L, "l4"), (3L, 9L, "l5"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"),
      (2L, 6L, "r@6"), (4L, 1L, "r@1"))
      .toDF("k", "rt", "pv")
    val got = PlannedAsOf.asofJoin(left, right, "k", "t", "rt",
        Seq("pv"))
      .select("tag", "pv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "l1" -> "r@10", // equal time matches (<=)
      "l2" -> "r@15", // most recent, carried past 10
      "l3" -> "r@15", // carried forward across left rows
      "l4" -> null, // right@6 is after left@5
      "l5" -> null)) // key has no right rows at all
  }

  test("plan uses AsOfJoinExec; pre-partitioned+sorted input adds no exchange") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "p")).toDF("k", "rt", "pv")
    val df = PlannedAsOf.asofJoin(left, right, "k", "t", "rt", Seq("pv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    // co-partitioned, pre-sorted children: EnsureRequirements must not
    // add any exchange or sort beyond the ones the user declared
    val ev = Tables.t(spark, TestSpark.sfDir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
    val lp = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"))
      .repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts_us"))
    val rp = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("vts"),
        col("value").as("vv"))
      .repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("vts"))
    val pre = PlannedAsOf.asofJoin(lp, rp, "user_id", "ts_us", "vts",
      Seq("vv"))
    pre.collect() // force execution (and any AQE re-planning)
    // count only the final adaptive plan, not the echoed initial plan
    val preStr = pre.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val nExchanges = "Exchange".r.findAllIn(preStr).length
    val nSorts = "Sort ".r.findAllIn(preStr).length
    assert(nExchanges === 2, s"expected only the 2 declared shuffles:\n$preStr")
    assert(nSorts === 2, s"expected only the 2 declared sorts:\n$preStr")
  }

  test("composite string+int keys merge correctly (natural row order)") {
    val left = Seq(("a", 1, 10L, "l1"), ("a", 2, 10L, "l2"),
      ("b", 1, 10L, "l3"), ("a", 1, 3L, "l4"))
      .toDF("k1", "k2", "t", "tag")
    val right = Seq(("a", 1, 5L, "r-a1@5"), ("a", 2, 11L, "r-a2@11"),
      ("b", 1, 9L, "r-b1@9"))
      .toDF("k1", "k2", "rt", "pv")
    val got = PlannedAsOf.asofJoin(left, right, Seq("k1", "k2"),
        "t", "rt", Seq("pv"))
      .select("tag", "pv").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "l1" -> "r-a1@5", // (a,1) matched, not (a,2)'s later row
      "l2" -> null, // (a,2)'s only right row is in the future
      "l3" -> "r-b1@9",
      "l4" -> null)) // (a,1)@3 precedes the right row at 5
  }

  test("rejects mismatched key/time types across sides") {
    val l = Seq((1, 2L)).toDF("k", "t")
    val r = Seq((1L, 1L, "x")).toDF("k", "rt", "p")
    intercept[IllegalArgumentException] {
      PlannedAsOf.asofJoin(l, r, "k", "t", "rt", Seq("p"))
    }
  }
}
