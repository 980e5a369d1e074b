package graft

import graft.config.PipelineConfig
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Reference XML config semantics (O11/O12). */
class ConfigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val xml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<config>
      |  <cdc changefeed="table_source/cdc_topic" consumer="v1"
      |       batchSize="10" actionTable="mat_view1">
      |    SELECT user_id, event_type, value_milli FROM rows
      |  </cdc>
      |  <cdc changefeed="table_source/cdc_topic" consumer="v2"
      |       updateQueryId="q1" deleteQueryId="qdel"/>
      |  <query id="q1" actionMode="upsertInto" actionTable="mat_view2">
      |    SELECT user_id, value_milli FROM rows
      |  </query>
      |  <query id="qdel" actionMode="deleteFrom" actionTable="mat_view2">
      |    SELECT user_id FROM rows
      |  </query>
      |</config>""".stripMargin

  test("xml parses: defaults, inline-wins, named query lookup") {
    val conf = PipelineConfig.fromXml(xml)
    assert(conf.pipelines.length === 2)
    val p1 = conf.pipelines.head
    assert(p1.consumer === "v1")
    assert(p1.batchSize === 10)
    assert(p1.threadsCount === 1) // default XmlConfig.java:19
    assert(p1.updateQuery.get.sql.contains("event_type"))
    val p2 = conf.pipelines(1)
    assert(p2.batchSize === 1000) // default XmlConfig.java:18
    assert(p2.updateQuery.get.actionTable === "mat_view2")
    assert(p2.deleteQuery.get.actionMode === "deleteFrom")
  }

  val schema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value_milli", LongType)))

  test("validation passes for well-formed pipelines") {
    val conf = PipelineConfig.fromXml(xml)
    val warnings = PipelineConfig.validate(spark, conf, schema,
      Seq("user_id"))
    assert(warnings.isEmpty, warnings.mkString("; "))
  }

  test("validation flags bad changefeed path, bad SQL, non-PK delete") {
    val bad =
      """<config>
        |  <cdc changefeed="nopathsep" consumer="w1"
        |       updateQueryId="qb" deleteQueryId="qd"/>
        |  <query id="qb" actionTable="t">SELECT no_such_col FROM rows</query>
        |  <query id="qd" actionMode="deleteFrom" actionTable="t">
        |    SELECT user_id, event_type FROM rows
        |  </query>
        |</config>""".stripMargin
    val warnings = PipelineConfig.validate(spark,
      PipelineConfig.fromXml(bad), schema, Seq("user_id"))
    assert(warnings.exists(_.contains("no table prefix")))
    assert(warnings.exists(_.contains("update query invalid")))
    assert(warnings.exists(_.contains("non-PK")))
  }
}
