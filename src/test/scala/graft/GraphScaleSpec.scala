package graft

import graft.operators.{Dedup, Ext3Queries, Ext7Queries}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 scale-margin fixes, proven at the shape that used to break:
  *   - connectedComponents (large-star/small-star) converges on a
  *     chain DEEPER than the old min-label-propagation iteration cap
  *     (which would have silently returned unconverged labels);
  *   - degree-ordered triangle enumeration bounds the oriented
  *     out-degree on a hub graph (the power-law skew case) while
  *     producing identical counts;
  *   - the windowed chain labeling equals the recursive-CTE walk
  *     row-for-row on real data.
  */
class GraphScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("connected components converge on a 60-hop chain (> old cap)") {
    import spark.implicits._
    // path graph 0-1-2-...-60: diameter 60, one component
    val pairs = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length === 61)
    assert(labels.forall(_._2 === 0L),
      s"unconverged labels: ${labels.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("connected components: multiple components, exact min labels") {
    import spark.implicits._
    // two chains + a clique + an isolated pair, shuffled ids
    val pairs = Seq(
      (5L, 9L), (9L, 13L), (13L, 21L), // chain -> min 5
      (2L, 4L), (4L, 6L), // chain -> min 2
      (100L, 101L), (100L, 102L), (101L, 102L), // clique -> min 100
      (50L, 51L) // pair -> min 50
    ).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(5L -> 5L, 9L -> 5L, 13L -> 5L, 21L -> 5L,
      2L -> 2L, 4L -> 2L, 6L -> 2L,
      100L -> 100L, 101L -> 100L, 102L -> 100L,
      50L -> 50L, 51L -> 50L)
    assert(got === want)
  }

  test("connected components throw on maxIter exhaustion, not silence") {
    import spark.implicits._
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // maxIter=1 cannot converge a 40-hop chain — must throw, never
    // return unconverged labels as if correct
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, maxIter = 1).collect()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("degree-ordered triangles: exact counts + hub contributes no wedges") {
    import spark.implicits._
    // hub 0 linked to leaves 1..40; triangles only via leaf-leaf edges
    // (1,2), (3,4): triangles (0,1,2) and (0,3,4)
    val edges = ((1L to 40L).map(l => (0L, l)) ++
      Seq((1L, 2L), (3L, 4L))).toDF("a", "b")
    val counts = Ext7Queries.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts === Map(0L -> 2L, 1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 1L))
    // the skew bound: after (degree, id) orientation the hub (raw
    // degree 40) has out-degree 0 — every edge points INTO it, so the
    // wedge self-join fans out from low-degree corners only
    val deg = edges.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(when(col("da") <= col("db"), col("a")).otherwise(col("b"))
        .as("src"))
    val outDeg = oriented.groupBy("src").agg(count(lit(1)).as("od"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!outDeg.contains(0L) || outDeg(0L) === 0L,
      s"hub kept out-degree ${outDeg.get(0L)}")
    assert(outDeg.values.max <= 3L,
      s"oriented out-degree not bounded: $outDeg")
  }

  test("windowed chain labeling equals the recursive-CTE walk") {
    val dir = TestSpark.sfDir
    val rec = Ext3Queries.recursiveChains(spark, dir).collect().toSeq
    val win = Ext3Queries.chainWindowed(spark, dir).collect().toSeq
    assert(win.size === rec.size)
    assert(win === rec)
  }
}
