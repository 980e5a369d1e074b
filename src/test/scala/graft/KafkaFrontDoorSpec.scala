package graft

import graft.config.YqlTranslate
import graft.operators.CdcParse
import graft.sinks.KeyedTableSink
import graft.sources.{Changelog, KafkaShapedSource, TopicBroker}
import graft.streaming.CdcPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The Kafka FRONT DOOR, end-to-end (round-4 verdict ask #4): a
  * DSv2 stream whose rows are natively kafka-shaped — the exact
  * spark-sql-kafka column contract, binary key/value included —
  * drives `Changelog.fromKafkaShaped` → `CdcPipeline` → sink with
  * zero pipeline changes, and converges to the same sink state as
  * the `topic://` source and the file replay. The broker itself is
  * the in-JVM [[TopicBroker]] stub (this sandbox can load no kafka
  * connector jar); everything ABOVE the transport — schema, binary
  * casts, partition-local offsets as `seq`, per-key partition-affine
  * ordering, admission caps, checkpointed restarts — is the
  * production path, exercised for real here.
  */
class KafkaFrontDoorSpec extends AnyFunSuite with StopStreamsAfterAll {
  lazy val spark = TestSpark.spark

  val schema = CdcParse.CdcSchema(
    StructType(Seq(
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value_milli", LongType))),
    pk = Seq("user_id"))

  def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  def kafkaStream(topic: String, opts: (String, String)*): DataFrame = {
    var r = spark.readStream
      .format("graft.sources.KafkaShapedSourceProvider")
      .option("subscribe", topic)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  def sinkRows(sink: KeyedTableSink): Set[(Long, String, Option[Long])] =
    sink.load().collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  def runOver(source: DataFrame, tag: String): KeyedTableSink = {
    val sink = new KeyedTableSink(spark, freshDir(s"sink-$tag"),
      Seq("user_id"), schema.columns)
    val p = CdcPipeline.Pipeline(s"kfd-$tag", "/unused",
      freshDir(s"ckpt-$tag"), schema,
      updateSql = Some(
        "SELECT user_id, event_type, value_milli FROM rows"),
      deleteSql = None, sink = sink)
    CdcPipeline.startWithSource(spark, p, source)
      .awaitTermination(120000)
    sink
  }

  test("source schema IS the spark-sql-kafka contract, column for " +
      "column") {
    val topic = s"kfd-schema-${System.nanoTime()}"
    TopicBroker.create(topic, 1)
    val got = kafkaStream(topic).schema
    // the published kafka source schema (spark-sql-kafka-0-10
    // KafkaRecordToRowConverter.kafkaSchema, headers excluded)
    val want = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    assert(got === want)
    assert(got === KafkaShapedSource.schema)
    TopicBroker.delete(topic)
  }

  test("kafka-format stream -> fromKafkaShaped -> pipeline -> sink " +
      "== topic:// path == file replay (end-to-end parity)") {
    val events = s"${TestSpark.sfDir}/events.parquet"
    // leg 1: file replay (the original oracle-checked path)
    val clog = freshDir("clog-kfd")
    Changelog.writeFromEvents(spark, events, clog, numFiles = 4)
    val fileSink = runOver(
      Changelog.readStream(spark, clog, maxFilesPerTrigger = 2), "file")
    // leg 2: the topic:// DSv2 source
    val topicA = s"kfd-a-${System.nanoTime()}"
    Changelog.publishFromEvents(spark, events, topicA, partitions = 3)
    val topicSink = runOver(
      Changelog.readTopicStream(spark, topicA,
        maxOffsetsPerTrigger = 300), "topicleg")
    // leg 3: the NATIVE kafka-shaped stream (binary key/value), with
    // the kafka admission-cap option spelled the kafka way, through
    // the documented adapter — the README front-door snippet verbatim
    // modulo the format name
    val topicB = s"kfd-b-${System.nanoTime()}"
    Changelog.publishFromEvents(spark, events, topicB, partitions = 3)
    val kafkaSink = runOver(
      Changelog.fromKafkaShaped(
        kafkaStream(topicB, "maxOffsetsPerTrigger" -> "300")),
      "kafkaleg")
    assert(sinkRows(kafkaSink).nonEmpty)
    assert(sinkRows(kafkaSink) === sinkRows(fileSink))
    assert(sinkRows(kafkaSink) === sinkRows(topicSink))
    TopicBroker.delete(topicA); TopicBroker.delete(topicB)
  }

  test("binary key column carries the producer key (partition-affine " +
      "routing witness)") {
    val topic = s"kfd-key-${System.nanoTime()}"
    TopicBroker.create(topic, 2)
    (0 until 10).foreach { i =>
      TopicBroker.sendKeyed(topic, i.toLong,
        s"""{"key":[$i],"update":{"event_type":"e","value_milli":$i}}""")
    }
    val rows = scala.collection.mutable.Buffer[(Long, Int)]()
    val q = kafkaStream(topic)
      .select(col("key").cast("string").cast("long").as("k"),
        col("partition"))
      .writeStream
      .option("checkpointLocation", freshDir("ckpt-key"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.collect().foreach(r => rows += ((r.getLong(0), r.getInt(1))))
        ()
      }
      .start()
    q.awaitTermination(120000)
    assert(rows.size === 10)
    // key rode the wire AND decided the partition (key % partitions)
    assert(rows.forall { case (k, p) => p === (k % 2).toInt })
    TopicBroker.delete(topic)
  }

  test("README mat_view1 scenario through the kafka front door " +
      "(YQL transform + re-type + LWW + upsert sink)") {
    // table_source schema + verbatim README YQL, as ReadmeScenarioSpec
    val srcSchema = CdcParse.CdcSchema(
      StructType(Seq(
        StructField("event_time", StringType),
        StructField("event_type", StringType),
        StructField("product_id", LongType),
        StructField("category_id", LongType),
        StructField("category_code", StringType),
        StructField("brand", StringType),
        StructField("price", DoubleType),
        StructField("user_id", LongType),
        StructField("user_session", StringType))),
      pk = Seq("product_id", "category_id", "user_id", "user_session"))
    val yql =
      """DECLARE $rows AS List<Struct<
        |    event_time: Text,
        |    event_type: Text,
        |    product_id: Uint32,
        |    category_id: Uint64,
        |    category_code: Text?,
        |    user_id: Uint32,
        |    user_session: Text
        |>>;
        |
        |$parse=DateTime::Parse('%Y-%m-%d %H:%M:%S %Z');
        |
        |UPSERT INTO mat_view1 SELECT
        |    Unwrap(DateTime::MakeTimestamp($parse(event_time))) AS event_time,
        |    event_type,
        |    product_id,
        |    user_id,
        |    category_id,
        |    user_session
        |FROM AS_TABLE($rows);""".stripMargin
    // render the README changelog and PUBLISH it keyed (by user_id —
    // a PK component, so per-key order == partition order)
    val rows = Tables.t(spark, TestSpark.sfDir, "events")
      .select(col("event_id"),
        date_format(Tables.eventsTsMicros,
          "yyyy-MM-dd HH:mm:ss 'UTC'").as("event_time"),
        col("event_type"),
        (col("event_id") % 50).as("product_id"),
        col("user_id").as("category_id"),
        col("user_id"),
        col("event_type").as("user_session"),
        round(col("value"), 2).as("price"))
      .orderBy("event_id").collect()
    def line(r: org.apache.spark.sql.Row): String = {
      val key = s"""[${r.getLong(3)},${r.getLong(4)},${r.getLong(5)},"${r.getString(6)}"]"""
      val upd = s"""{"event_time":"${r.getString(1)}","event_type":"${r.getString(2)}",""" +
        s""""product_id":${r.getLong(3)},"category_id":${r.getLong(4)},""" +
        s""""category_code":"cc","brand":"bb","price":${r.getDouble(7)},""" +
        s""""user_id":${r.getLong(5)},"user_session":"${r.getString(6)}"}"""
      if (r.getLong(0) % 17 == 0) s"""{"key":$key,"erase":{}}"""
      else s"""{"key":$key,"update":$upd}"""
    }
    val topic = s"kfd-readme-${System.nanoTime()}"
    TopicBroker.create(topic, 3)
    rows.foreach(r => TopicBroker.sendKeyed(topic, r.getLong(5), line(r)))
    val tr = YqlTranslate(yql)
    val sinkSchema = StructType(Seq(
      StructField("event_time", TimestampType),
      StructField("event_type", StringType),
      StructField("product_id", LongType),
      StructField("user_id", LongType),
      StructField("category_id", LongType),
      StructField("user_session", StringType)))
    val pk = Seq("product_id", "category_id", "user_id", "user_session")
    val sink = new KeyedTableSink(spark, freshDir("sink-readme"), pk,
      sinkSchema)
    val p = CdcPipeline.Pipeline(
      consumer = s"kfd-readme-${System.nanoTime()}",
      changelogDir = "/unused",
      checkpointDir = freshDir("ckpt-readme"),
      schema = srcSchema,
      updateSql = Some(tr.sql), deleteSql = None,
      sink = sink, action = tr.actionMode,
      viewCols = tr.declaredCols)
    CdcPipeline.startWithSource(spark, p,
        Changelog.fromKafkaShaped(
          kafkaStream(topic, "maxOffsetsPerTrigger" -> "250")))
      .awaitTermination(180000)
    val got = sink.load()
    assert(got.count() > 0)
    assert(got.schema("event_time").dataType === TimestampType)
    // golden: batch-side parse + LWW + same transform over the same
    // messages, read back from the broker
    val all = (0 until 3).flatMap { pt =>
      TopicBroker.readKeyed(topic, pt, 0,
        TopicBroker.endOffsets(topic)(pt)).zipWithIndex
        .map { case ((_, v), off) => (v, off.toLong) }
    }
    import spark.implicits._
    val batch = all.toDF("value", "seq")
    val typed = CdcParse.parseEnvelope(batch, "value", srcSchema)
      .filter(col("op") =!= CdcParse.OpDrop)
    val lww = graft.operators.KeyedMerge.lww(typed, pk, "seq")
    val want = lww.filter(col("op") =!= CdcParse.OpErase)
      .select(to_timestamp(col("event_time"),
        "yyyy-MM-dd HH:mm:ss zz").as("event_time"),
        col("event_type"), col("product_id"), col("user_id"),
        col("category_id"), col("user_session"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    TopicBroker.delete(topic)
  }
}
