package graft

import graft.Tables.t
import graft.operators.Ext44Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the substring-span / bloom / feature-hash batch. */
class Ext44OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("substring spans: every reported span occurs in >= 2 docs, " +
    "occurrences >= docs, and a planted span is found") {
    val rows = Ext44Queries.substringSpans(spark, TestSpark.sfDir)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(2) >= r.getLong(1))
      assert(r.getLong(3) <= r.getLong(4))
    }
    // planted check: two docs sharing an 8-token span, one unrelated
    import spark.implicits._
    val span = (0 until 8).map(i => s"x$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta $span gamma"),
      (2L, s"$span delta epsilon"),
      (3L, "nothing shared here at all in this doc okay"))
      .toDF("doc_id", "text")
    val tk = split(trim(col("text")), "\\s+")
    val got = df.select(col("doc_id"), tk.as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 8)
      .withColumn("pos", explode(sequence(lit(1), col("n") - 7)))
      .withColumn("h", md5(concat_ws(" ",
        slice(col("tk"), col("pos"), lit(8)))))
      .groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).count()
    assert(got === 1L, "exactly the planted span is multi-doc")
  }

  test("bloom: fpr consistent with bits set, members never counted " +
    "as false positives, and theory ballpark holds") {
    val r = Ext44Queries.bloomFpr(spark, TestSpark.sfDir).head()
    val (nm, np, bits, nfp, fpr) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nm > 0 && np > 0)
    assert(bits <= math.min(4096L, nm * 3))
    assert(nfp <= np)
    assert(fpr === nfp * 1000000L / np)
    // theory: p = (bits/4096)^3; measured within 5x either way
    // (loose: small-sample noise at sf0.001)
    val p = math.pow(bits.toDouble / 4096.0, 3)
    val measured = nfp.toDouble / np
    assert(measured <= p * 5 + 0.01)
  }

  test("feature hash: weights bounded by token counts, dim in " +
    "[0,8), deterministic across runs") {
    val rows = Ext44Queries.hashedBow(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val nTok = t(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 8)
      assert(math.abs(r.getLong(2)) <= nTok(r.getLong(0)))
    }
    val again = Ext44Queries.hashedBow(spark, TestSpark.sfDir)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
