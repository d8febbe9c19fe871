package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class KafkaSpec extends SparkSpec {
  import spark.implicits._

  test("source config plumbs every Kafka option") {
    val cfg = Kafka.SourceConfig(
      bootstrapServers = "broker-1:9092,broker-2:9092",
      topic = "cdc.public.documents",
      startingOffsets = "latest",
      groupIdPrefix = Some("quality-processor"),
      maxOffsetsPerTrigger = Some(5000L),
      failOnDataLoss = false)
    assert(cfg.options === Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "subscribe" -> "cdc.public.documents",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "false",
      "groupIdPrefix" -> "quality-processor",
      "maxOffsetsPerTrigger" -> "5000"))
    // the reader builds without a broker — it's pure configuration
    cfg.reader(spark)
  }

  test("source load() reaches the kafka data source (no connector here)") {
    // the sandbox ships no spark-sql-kafka jar, so resolution must
    // fail ON THE KAFKA SOURCE — proof the format + options are wired
    // all the way to load(), not stubbed
    val cfg = Kafka.SourceConfig("broker:9092", "events")
    val ex = intercept[Exception] { cfg.load(spark) }
    assert(ex.getMessage.toLowerCase.contains("kafka"))
  }

  test("sink writer is the S9 JSON projection aimed at the topic") {
    val cfg = Kafka.SinkConfig("broker:9092", "quality.checks", "/tmp/ckpt")
    assert(cfg.options("topic") === "quality.checks")
    assert(cfg.options("checkpointLocation") === "/tmp/ckpt")
    // building the writer performs the key/value projection; starting
    // it would need the connector — construction alone must succeed
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val df = mem.toDF().toDF("doc_id", "text", "quality_score")
    cfg.writer(df, "doc_id")
  }

  test("decodeRecords yields the shared (key, value, timestamp) shape") {
    val kafkaShaped = Seq(
      ("1".getBytes, """{"op":"c"}""".getBytes, new java.sql.Timestamp(1000L)))
      .toDF("key", "value", "timestamp")
    val decoded = Kafka.decodeRecords(kafkaShaped)
    assert(decoded.schema.fields.map(f => f.name -> f.dataType.typeName).toSeq
      === Seq("key" -> "string", "value" -> "string", "timestamp" -> "timestamp"))
    val r = decoded.head
    assert(r.getString(0) === "1" && r.getString(1) === """{"op":"c"}""")
  }

  test("quality topology composes decode → enrich → S9 sink unstarted") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val records = mem.toDF().toDF("key", "value")
      .withColumn("timestamp", current_timestamp())
    val sink = Kafka.SinkConfig("broker:9092", "quality.checks", "/tmp/ck2")
    // full topology builds without a broker; starting needs the jar
    Kafka.qualityTopologyFrom(Kafka.decodeRecords(records), sink)
    // and the Kafka-source variant fails only AT the kafka source
    val ex = intercept[Exception] {
      Kafka.qualityTopology(spark,
        Kafka.SourceConfig("broker:9092", "cdc.public.documents"), sink)
    }
    assert(ex.getMessage.toLowerCase.contains("kafka"))
  }

  test("env-driven construction mirrors the reference deployment contract") {
    val env = Map(
      "KAFKA_BOOTSTRAP_SERVERS" -> "kafka:9092",
      "KAFKA_CONSUMER_GROUP" -> "event-processor-group",
      "CDC_DOCUMENTS_TOPIC" -> "cdc.public.documents")
    val cfg = Kafka.sourceFromEnv(env, "CDC_DOCUMENTS_TOPIC")
    assert(cfg.bootstrapServers === "kafka:9092")
    assert(cfg.topic === "cdc.public.documents")
    assert(cfg.groupIdPrefix === Some("event-processor-group"))
    assert(cfg.startingOffsets === "earliest")
  }
}
