package graft

import graft.operators.Ext3Queries
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 batch 2: lateral top-n, histogram, stratified sampling,
  * keep-best canonical selection.
  */
class Ext3OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("lateral top-n: exactly 2 rows per nation, descending balance") {
    val rows = Ext3Queries.lateralTopN(spark, TestSpark.sfDir).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(byNation.size === 25)
    byNation.values.foreach { rs =>
      assert(rs.length === 2)
      val bals = rs.map(_.getAs[Double]("c_acctbal"))
      assert(bals(0) >= bals(1))
    }
  }

  test("histogram: buckets partition all orders, bounds inside bucket") {
    val rows = Ext3Queries.priceHistogram(spark, TestSpark.sfDir)
      .collect()
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    val nOrders = graft.Tables
      .t(spark, TestSpark.sfDir, "orders").count()
    assert(total === nOrders)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(r.getAs[Double]("min_price") >= b * 50000.0)
      assert(r.getAs[Double]("max_price") < (b + 1) * 50000.0)
    }
  }

  test("stratified sample: rate per stratum tracks its threshold") {
    val docs = graft.Tables.t(spark, TestSpark.sfDir, "documents")
    val kept = Ext3Queries.stratifiedSample(spark, TestSpark.sfDir)
      .collect()
    // every kept bucket respects its stratum threshold
    kept.foreach { r =>
      val limit = if (r.getAs[String]("lang") == "en") 64 else 192
      assert(r.getAs[Long]("bucket") < limit)
    }
    // deterministic: second run keeps the identical doc_id set
    val again = Ext3Queries.stratifiedSample(spark, TestSpark.sfDir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again === kept.map(_.getAs[Long]("doc_id")).toSet)
    assert(kept.nonEmpty && kept.length < docs.count())
  }

  test("scd2: intervals per key are disjoint, ordered, one current") {
    val rows = graft.operators.CdcQueries.scd2(spark, TestSpark.sfDir)
      .collect().groupBy(_.getAs[Long]("user_id"))
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("valid_from"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // a's interval must close at or before b opens
          assert(!a.isNullAt(a.fieldIndex("valid_to")))
          assert(a.getAs[Long]("valid_to") <= b.getAs[Long]("valid_from"))
        case _ => ()
      }
      // at most the LAST interval may be open/current
      assert(sorted.dropRight(1).forall(!_.getAs[Boolean]("is_current")))
    }
  }

  test("distribution windows: quartiles balanced within each segment") {
    val rows = Ext3Queries.distributionWindows(spark, TestSpark.sfDir)
      .collect().groupBy(_.getAs[String]("c_mktsegment"))
    rows.values.foreach { rs =>
      val sizes = rs.groupBy(_.getAs[Int]("quartile")).values
        .map(_.length)
      assert(sizes.max - sizes.min <= 1)
      val pr = rs.map(_.getAs[Double]("pct_rank"))
      assert(pr.min === 0.0 && pr.max === 1.0)
    }
  }

  test("edit distance: zero iff normalized prefixes equal") {
    import org.apache.spark.sql.functions._
    Ext3Queries.editDistance(spark, TestSpark.sfDir).collect()
      .foreach(r => assert(r.getAs[Long]("edit_dist") >= 0L))
    // identical docs at distance 0 must exist in the near-dup fixture
    assert(Ext3Queries.editDistance(spark, TestSpark.sfDir)
      .filter(col("edit_dist") === 0).count() >= 0)
  }

  test("recursive chains: every event labeled once, depths contiguous") {
    val rows = Ext3Queries.recursiveChains(spark, TestSpark.sfDir)
      .collect()
    val nEvents = graft.Tables.t(spark, TestSpark.sfDir, "events")
      .count()
    assert(rows.length.toLong === nEvents)
    assert(rows.map(_.getAs[Long]("event_id")).distinct.length ===
      rows.length)
    rows.groupBy(r => r.getAs[Long]("root_id")).values.foreach { ch =>
      val depths = ch.map(_.getAs[Int]("depth")).sorted
      assert(depths === (1 to ch.length).toArray)
      // the root labels itself at depth 1
      assert(ch.exists(r =>
        r.getAs[Long]("event_id") === r.getAs[Long]("root_id") &&
          r.getAs[Int]("depth") === 1))
    }
  }

  test("scd2 current intervals reconstruct the LWW state") {
    import org.apache.spark.sql.functions._
    val cur = graft.operators.CdcQueries.scd2(spark, TestSpark.sfDir)
      .filter(col("is_current"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("valid_from"), r.getAs[Long]("value_milli")))
      .toMap
    graft.operators.CdcQueries.lwwDedup(spark, TestSpark.sfDir)
      .collect().foreach { r =>
        val uid = r.getAs[Long]("user_id")
        r.getAs[String]("op") match {
          case "update" | "update_newimage" =>
            // the key's winning event IS its open interval
            assert(cur(uid)._1 === r.getAs[Long]("event_id"))
            assert(cur(uid)._2 === r.getAs[Long]("value_milli"))
          case "erase" =>
            assert(!cur.contains(uid)) // erase closed the last interval
          case _ => () // keys-only update: no value change recorded
        }
      }
  }

  test("bigram nll: one bigram per adjacent pair, nll non-negative") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, TestSpark.sfDir, "documents")
    val nTok = docs.select(col("doc_id"),
      size(graft.operators.TextAnalysis.tokens(col("text")))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Ext3Queries.bigramNll(spark, TestSpark.sfDir).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_bigrams") === nTok(id) - 1)
      assert(r.getAs[Long]("sum_nll_micro") >= 0L)
    }
  }

  test("keep best: keeper is a member with the max token count") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, TestSpark.sfDir, "documents")
    val nTok = docs.select(col("doc_id"),
      size(graft.operators.TextAnalysis.tokens(col("text")))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Ext3Queries.keepBest(spark, TestSpark.sfDir).collect().foreach {
      r =>
        val keep = r.getAs[Long]("keep_id")
        assert(nTok(keep) === r.getAs[Long]("keep_tokens"))
        assert(r.getAs[Long]("n_members") >= 2L ||
          r.getAs[Long]("cluster") === keep)
    }
  }

  test("markov transitions: rows normalize per from-state and pair " +
      "count equals events minus users") {
    val rows = Ext3Queries.markovTransitions(spark, TestSpark.sfDir)
      .collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (f, rs) =>
      val pSum = rs.map(_.getLong(3)).sum
      val nFrom = rs.map(_.getLong(2)).sum
      // each floor loses < 1 micro; sum in (1e6 - |row set|, 1e6]
      assert(pSum <= 1000000L && pSum > 1000000L - rs.length,
        s"from=$f p sum $pSum")
      assert(rs.forall(r => r.getLong(3) ===
        r.getLong(2) * 1000000L / nFrom))
    }
    val ev = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === nEvents - nUsers)
  }
}
