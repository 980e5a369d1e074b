package graft

import graft.plans.PlannedAsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence: the hand-written AsOfJoinExec merge versus
  * the independent union+carry-forward formulation, across seeds with
  * duplicate left keys/times, left rows before any right row, keys
  * with no right rows, and null left keys. Right (key, time) pairs
  * are kept unique per seed — BOTH formulations are tie-ambiguous on
  * exact right duplicates (window order vs merge order), so that case
  * is excluded from the contract rather than silently depended on.
  */
class PlannedAsOfPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("random datasets: planned merge == union carry-forward") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(6)
      val left = (1 to 120).map { i =>
        val k: java.lang.Long =
          if (rnd.nextInt(20) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(nKeys).toLong)
        (k, rnd.nextInt(50).toLong, i.toLong)
      }
      val right = rnd.shuffle(
        (for (k <- 0 until nKeys; t <- 0 until 50) yield (k, t))
          .filter(_ => rnd.nextInt(4) == 0))
        .map { case (k, t) =>
          (k.toLong, t.toLong, s"p$k@$t")
        }
      val lDf = left.toDF("k", "t", "id")
      val rDf = right.toDF("k", "rt", "pv")
      val planned = PlannedAsOf.asofJoin(lDf, rDf, "k", "t", "rt",
          Seq("pv", "rt"))
        .select("id", "pv", "rt").collect()
        .map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
      val union = graft.operators.AsOf.asofJoin(lDf, rDf, Seq("k"),
          "t", "rt", Seq("pv", "rt"))
        .select("id", "pv", "rt").collect()
        .map(r => (r.getLong(0), r.getString(1), r.get(2))).toSet
      // null-key left rows: planned emits null payload (SQL join
      // semantics); the union window would group them together, but
      // with no null-key right rows both yield null payloads too
      assert(planned === union, s"seed $seed diverged")
    }
  }
}
