package graft

import graft.Tables.t
import graft.operators.Ext28Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the community/projection/drawdown batch. */
class Ext28OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("label prop: node conservation, labels are nodes, convergence " +
    "direction") {
    val rows = Ext28Queries.labelProp(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val nodes = rows.map(_._1).toSet
    assert(rows.length === nodes.size, "one row per node")
    // every label is an existing node id (labels only propagate)
    assert(rows.map(_._3).toSet.subsetOf(nodes))
    // community sizes account for every node
    val byLabel = rows.groupBy(_._3).map { case (l, g) => l -> g.length }
    rows.foreach { case (_, kind, label, size) =>
      assert(size === byLabel(label).toLong)
      assert(kind === "customer" || kind === "supplier")
    }
    // LPA on a connected-ish interaction graph must coarsen: strictly
    // fewer communities than nodes
    assert(byLabel.size < nodes.size)
  }

  test("label prop: one synchronous iteration replayed on the driver") {
    // tiny replay at sf0.001: rebuild edges, run ONE sync iteration in
    // scala, compare against a 1-iteration run of the same rule
    val dir = TestSpark.sfDir
    val o = t(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val l = t(spark, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val oneWay = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = oneWay.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val expect = edges.groupBy(_._1).map { case (src, es) =>
      // initial label = node id, so neighbor labels are the dst ids
      val counts = es.map(_._2).groupBy(identity)
        .map { case (lbl, g) => (lbl, g.length) }
      val best = counts.toSeq.sortBy { case (lbl, c) => (-c, lbl) }.head._1
      src -> best
    }
    // run the operator's rule for exactly one iteration via SQL on the
    // same edge set
    import spark.implicits._
    val e = edges.toSeq.toDF("src", "dst")
    val l0 = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("cnt").desc, col("nlabel"))
    val got = e.join(l0.withColumnRenamed("node", "dst2"),
        col("dst") === col("dst2"))
      .groupBy(col("src"), col("label").as("nlabel"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("src", "nlabel").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expect)
  }

  test("bipartite projection: weights bounded by degrees, cap honored," +
    " ordering") {
    val rows = Ext28Queries.bipartiteProject(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, w, da, db, cosMicro) =>
      assert(a < b)
      assert(w <= math.min(da, db), "shared <= each degree")
      assert(cosMicro ===
        math.round(w.toDouble / math.sqrt(da.toDouble * db) * 1e6))
      assert(cosMicro <= 1000000L)
    }
    val ws = rows.map(_._3).toSeq
    assert(ws === ws.sortBy(-_), "descending by shared customers")
  }

  test("drawdown: window replay per event type on the driver") {
    val rows = Ext28Queries.drawdown(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val daily = t(spark, TestSpark.sfDir, "events")
      .select(col("event_type"),
        expr("cast(ts div 86400000000000 as bigint)").as("day"),
        when(col("event_type") === "error",
          -expr("cast(round(value * 1000) as bigint)"))
          .otherwise(expr("cast(round(value * 1000) as bigint)"))
          .as("vm"))
      .groupBy("event_type", "day").agg(sum("vm").as("flow"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    assert(rows.map(_._1).toSet === byType.keySet)
    rows.foreach { case (et, nDays, ddMax, trough, peakAll, peakAtTr,
        fin) =>
      val series = byType(et).sortBy(_._2)
      assert(nDays === series.length.toLong)
      var cum = 0L; var peak = Long.MinValue
      var bestDd = Long.MinValue; var bestDay = 0L; var bestPeak = 0L
      var maxPeak = Long.MinValue
      series.foreach { case (_, day, flow) =>
        cum += flow; peak = math.max(peak, cum)
        maxPeak = math.max(maxPeak, peak)
        val dd = peak - cum
        if (dd > bestDd) { bestDd = dd; bestDay = day; bestPeak = peak }
      }
      assert(ddMax === bestDd, s"$et max drawdown")
      assert(trough === bestDay, s"$et trough day (first max)")
      assert(peakAll === maxPeak)
      assert(peakAtTr === bestPeak)
      assert(fin === cum)
      assert(ddMax >= 0)
    }
    // the error-negation must produce at least one real dip somewhere
    assert(rows.exists(_._3 > 0), "drawdown battery is inert: no dips")
  }
}
