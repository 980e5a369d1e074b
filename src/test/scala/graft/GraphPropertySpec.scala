package graft

import graft.operators.{Dedup, Ext7Queries}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-4 graph rewrites: random graphs
  * checked against driver-side brute force (union-find for connected
  * components, triple-loop enumeration for triangles). The generators
  * are seeded — failures reproduce exactly.
  */
class GraphPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random pair list: n nodes, ~m edges. */
  def randomPairs(seed: Int, n: Int, m: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until m).flatMap { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      if (a == b) None
      else Some((math.min(a, b), math.max(a, b)))
    }.distinct
  }

  /** Driver-side union-find with path compression. */
  def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: every node maps to the minimum of its component
    parent.keys.map(x => x -> find(x)).toMap
  }

  test("connected components == union-find on 20 random graphs") {
    import spark.implicits._
    for (seed <- 1 to 20) {
      // mix of sparse and dense regimes, including chain-heavy ones
      val n = 20 + seed * 7
      val m = if (seed % 3 == 0) n / 2 else n * 2
      val pairs = randomPairs(seed, n, m)
      if (pairs.nonEmpty) {
        val got = Dedup.connectedComponents(
            pairs.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = unionFind(pairs)
        assert(got === want, s"seed=$seed n=$n m=$m")
      }
    }
  }

  test("one long path + one big star + bridge: exact labels") {
    import spark.implicits._
    // worst cases for propagation-style algorithms in one graph:
    // a 50-hop path (0..50), a star centered at 100 with leaves
    // 101..160, and a bridge 50-100 merging them into ONE component
    val pairs = ((0L until 50L).map(i => (i, i + 1)) ++
      (101L to 160L).map(l => (100L, l)) :+ (50L, 100L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 112)
    assert(got.values.forall(_ == 0L), got.filter(_._2 != 0L).take(5))
  }

  /** Driver-side brute-force triangle-per-node counts. */
  def bruteTriangles(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.toSet
    def has(a: Long, b: Long) =
      es((math.min(a, b), math.max(a, b)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val counts = scala.collection.mutable.Map[Long, Long]()
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      k <- (j + 1) until nodes.length
      a = nodes(i); b = nodes(j); c = nodes(k)
      if has(a, b) && has(b, c) && has(a, c)
    } Seq(a, b, c).foreach(v =>
      counts(v) = counts.getOrElse(v, 0L) + 1L)
    counts.toMap
  }

  test("degree-ordered triangle counts == brute force on 12 random " +
      "graphs (incl. a hub)") {
    import spark.implicits._
    for (seed <- 1 to 12) {
      val n = 12 + seed * 3
      val base = randomPairs(seed + 100, n, n * 3)
      // graft a hub touching everything — the skew case the
      // orientation exists for
      val hub = (0 until n by 2).map(v => (v.toLong, 999L))
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      val pairs = (base ++ hub).distinct
      val got = Ext7Queries.triangleCounts(pairs.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = bruteTriangles(pairs)
      assert(got === want, s"seed=$seed n=$n")
    }
  }
}
