package graft

import graft.plans.PlannedTopK
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The planned grouped top-k: row-for-row equal to the window
  * formulation (several k, composite tiebreaks, null keys and null
  * scores), rank contract, and the plan property the operator exists
  * for — NO sort anywhere in its physical plan.
  */
class PlannedTopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
      key: String, score: String, tie: String, k: Int) =
    df.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(key)
          .orderBy(col(score).desc, col(tie))))
      .filter(col("rank") <= k)

  test("equals the window formulation on orders for k = 1, 3, 7") {
    val o = Tables.t(spark, TestSpark.sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    Seq(1, 3, 7).foreach { k =>
      val planned = PlannedTopK.topKPerKey(o, Seq("o_custkey"),
          "o_totalprice", Seq("o_orderkey"), k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      val win = windowTopK(o, "o_custkey", "o_totalprice",
          "o_orderkey", k)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3))).toSet
      assert(planned === win, s"k=$k")
    }
  }

  test("null keys form a group; null scores sort last (DESC default)") {
    val df = Seq(
      (Some(1L), Some(10.0), 1L), (Some(1L), Some(30.0), 2L),
      (Some(1L), None, 3L), (Some(1L), Some(20.0), 4L),
      (None, Some(5.0), 5L), (None, Some(7.0), 6L))
      .toDF("k", "s", "id")
    val planned = PlannedTopK.topKPerKey(df, Seq("k"), "s",
        Seq("id"), 2)
      .select("k", "id", "rank").collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getInt(2))).toSet
    val win = windowTopK(df, "k", "s", "id", 2)
      .select("k", "id", "rank").collect()
      .map(r => (Option(r.get(0)), r.getLong(1), r.getInt(2))).toSet
    assert(planned === win)
    // null group kept, ranked by score desc
    assert(planned.contains((None, 6L, 1)))
    assert(planned.contains((None, 5L, 2)))
    // the null score lost to all three real scores
    assert(!planned.exists(t => t._1 == Some(1L) && t._2 == 3L))
  }

  test("no sort in the physical plan; one exchange on the keys") {
    val o = Tables.t(spark, TestSpark.sfDir, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val plan = PlannedTopK.topKPerKey(o, Seq("o_custkey"),
        "o_totalprice", Seq("o_orderkey"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopK"))
    assert(!plan.contains("Sort"),
      s"planned top-k must not sort:\n$plan")
    assert(plan.contains("hashpartitioning(o_custkey"))
    // the window formulation pays the sort this operator avoids
    val winPlan = windowTopK(o, "o_custkey", "o_totalprice",
      "o_orderkey", 3).queryExecution.executedPlan.toString
    assert(winPlan.contains("Sort"))
  }

  test("composite keys and composite tiebreaks") {
    val li = Tables.t(spark, TestSpark.sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_orderkey", "l_linenumber")
    val planned = PlannedTopK.topKPerKey(li,
        Seq("l_returnflag", "l_linestatus"), "l_quantity",
        Seq("l_orderkey", "l_linenumber"), 4)
      .collect().map(_.toSeq).toSet
    val win = li.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag", "l_linestatus")
          .orderBy(col("l_quantity").desc, col("l_orderkey"),
            col("l_linenumber"))))
      .filter(col("rank") <= 4).collect().map(_.toSeq).toSet
    assert(planned === win)
  }
}
