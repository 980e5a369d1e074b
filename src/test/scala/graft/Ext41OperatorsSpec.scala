package graft

import graft.Tables.t
import graft.operators.{Dedup, Ext41Queries, NearDupGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the incremental-CC / schema-drift / multi-pivot
  * batch.
  */
class Ext41OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("cc incremental == full CC over all edges, and the " +
    "contraction really merges across the delta") {
    val got = Ext41Queries.ccIncremental(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Dedup.connectedComponents(
        NearDupGraph.lshPairs(spark, TestSpark.sfDir)
          .select("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === full, "incremental labels != full CC labels")
    // the hand case: base chain 1-2, delta edge 2-3 (node 3 new)
    import spark.implicits._
    val base = Seq((1L, 2L)).toDF("id_a", "id_b")
    val baseLabels = Dedup.connectedComponents(base)
    val delta = Seq((2L, 3L)).toDF("id_a", "id_b")
    val labels0 = baseLabels.unionByName(
      delta.select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .distinct().join(baseLabels, Seq("id"), "left_anti")
        .withColumn("cluster", col("id")))
    val lblEdges = delta
      .join(labels0.select(col("id").as("id_a"),
        col("cluster").as("la")), "id_a")
      .join(labels0.select(col("id").as("id_b"),
        col("cluster").as("lb")), "id_b")
      .select(col("la").as("id_a"), col("lb").as("id_b"))
      .filter(col("id_a") =!= col("id_b")).distinct()
    val lblMap = Dedup.connectedComponents(lblEdges)
      .select(col("id").as("cluster"), col("cluster").as("merged"))
    val merged = labels0.join(lblMap, Seq("cluster"), "left")
      .select(col("id"),
        coalesce(col("merged"), col("cluster")).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("schema drift: exactly the injected key, with exact count " +
    "and seq bounds") {
    val rows = Ext41Queries.schemaDrift(spark, TestSpark.sfDir)
      .collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("region_code"))
    val ids = t(spark, TestSpark.sfDir, "events")
      .filter(col("event_id") % 17 === 0)
      .select("event_id").collect().map(_.getLong(0))
    assert(rows.head.getLong(1) === ids.length)
    assert(rows.head.getLong(2) === ids.min)
    assert(rows.head.getLong(3) === ids.max)
  }

  test("pivot multi: cells match the groupBy equivalent, counts " +
    "never null") {
    val rows = Ext41Queries.pivotMulti(spark, TestSpark.sfDir)
      .collect()
    val want = t(spark, TestSpark.sfDir, "orders")
      .filter(col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double").as("s"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val schema = Ext41Queries.pivotMulti(spark, TestSpark.sfDir)
      .schema.fieldNames
    rows.foreach { r =>
      val st = r.getString(0)
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM").foreach { p =>
        val ti = schema.indexOf(s"${p}_total")
        val ni = schema.indexOf(s"${p}_n")
        assert(ti > 0 && ni > 0, s"missing pivot columns for $p")
        want.get((st, p)) match {
          case Some((s, n)) =>
            assert(r.getDouble(ti) === s); assert(r.getLong(ni) === n)
          case None =>
            assert(r.isNullAt(ti)); assert(r.getLong(ni) === 0L)
        }
      }
    }
  }
}
