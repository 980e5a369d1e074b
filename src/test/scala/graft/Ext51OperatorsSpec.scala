package graft

import graft.Tables.t
import graft.operators.{Ext51Queries, Similarity}
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the shard-merge / txn-assembly / observe batch. */
class Ext51OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("shard merge: both rank stages group-limited, and the merged " +
    "top-k equals the direct top-k exactly") {
    val df = Ext51Queries.topkShardMerge(spark, TestSpark.sfDir)
    assert(df.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val emb = t(spark, TestSpark.sfDir, "embeddings")
    val direct = Similarity.cosineTopK(emb,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 108),
      "vec_id", "embedding", k = 12)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq === direct.toSeq)
    assert(got.nonEmpty)
  }

  test("txn assembly: incomplete transactions held back entirely; " +
    "with nothing in flight the boundary apply equals plain LWW") {
    val parsed = graft.operators.CdcQueries
      .parsedStored(spark, TestSpark.sfDir)
      .select("event_id", "op", "user_id", "event_type", "value_milli")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)), if (r.isNullAt(4)) 0L else r.getLong(4)))
    val arrived = parsed.filter(_._1 % 101 != 0)
    val completeTx = arrived.groupBy(_._1 / 8)
      .filter(_._2.length == 8).keySet
    // every held txn is genuinely missing a slot
    val heldTx = arrived.map(_._1 / 8).distinct.filterNot(completeTx)
    assert(heldTx.nonEmpty, "fixture must produce in-flight txns")
    heldTx.foreach { tx =>
      val present = arrived.filter(_._1 / 8 == tx).map(_._1 % 8).toSet
      assert(present.size < 8, s"txn $tx held but complete")
    }
    def lww(rows: Array[(Long, String, Long, Option[String], Long)]) =
      rows.filter(r => Set("update", "update_newimage", "erase")(r._2))
        .groupBy(_._3).view.mapValues(_.maxBy(_._1))
        .filter(_._2._2 != "erase")
        .map { case (u, r) => (u, r._1, r._4.orNull, r._5) }
        .toSeq.sortBy(_._1)
    val want = lww(arrived.filter(r => completeTx(r._1 / 8)))
    val got = Ext51Queries.txnAssembly(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) 0L else r.getLong(3)))
    assert(got.toSeq === want)
    // the guard matters: the boundary check withholds applicable rows
    // (the final LWW state may or may not coincide — that depends on
    // which txns the in-flight markers hit — but the applied set must
    // shrink whenever a held txn carries applicable ops)
    val applicable = Set("update", "update_newimage", "erase")
    val heldApplicable = arrived.filter(r =>
      heldTx.contains(r._1 / 8) && applicable(r._2))
    assert(heldApplicable.nonEmpty,
      "held txns must be withholding real ops")
    assert(arrived.count(r => applicable(r._2)) >
      arrived.count(r => completeTx(r._1 / 8) && applicable(r._2)))
    // and with every row arrived, boundaries become a no-op
    assert(lww(parsed) === lww(parsed.filter(r =>
      parsed.groupBy(_._1 / 8).filter(_._2.length == 8)
        .keySet(r._1 / 8))))
  }

  test("observe: CollectMetrics rides the main pass and the metrics " +
    "row equals the direct aggregate") {
    val ev = t(spark, TestSpark.sfDir, "events").select(col("event_type"),
      expr("cast(round(value * 1000) as bigint)").as("vm"))
    val obs = Observation()
    val named = ev.observe(obs, count(lit(1)).as("n"))
    assert(named.queryExecution.analyzed.toString
      .contains("CollectMetrics"))
    val got = Ext51Queries.observeMetrics(spark, TestSpark.sfDir)
      .collect().head
    val want = ev.agg(count(lit(1)), sum("vm"), min("vm"), max("vm"),
      sum(when(col("event_type") === "error", 1L).otherwise(0L)))
      .collect().head
    assert((0 until 5).map(got.getLong) ===
      (0 until 5).map(want.getLong))
  }
}
