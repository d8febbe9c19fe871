package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** S7/S8/S9: the Kafka wiring as CONFIG, not code — mirroring the
  * reference's env-driven setup (services/data-quality/app/config.py:26-27
  * KAFKA_BOOTSTRAP_SERVERS / KAFKA_CONSUMER_GROUP, main.py:212-233
  * input/output topics). The builders produce fully-configured
  * readers/writers against Spark's `kafka` source; every transform
  * between them is the same batch-tested function from
  * [[Pipelines]] / [[graft.cdc.Cdc]], so swapping MemoryStream for a
  * broker changes configuration only.
  *
  * The sandbox has no Kafka connector jar or broker, so specs
  * construct the configured (unstarted) plumbing and assert the
  * option surface; `load()`/`start()` are exercised in deployments
  * that ship `spark-sql-kafka`.
  */
object Kafka {

  /** Subscribe-side options (Spark structured-streaming Kafka source
    * option names; `kafka.`-prefixed keys pass through to the
    * consumer).
    */
  final case class SourceConfig(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      groupIdPrefix: Option[String] = None,
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true) {
    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      groupIdPrefix.map("groupIdPrefix" -> _) ++
      maxOffsetsPerTrigger.map(m => "maxOffsetsPerTrigger" -> m.toString)

    /** The configured (unstarted) reader. */
    def reader(spark: SparkSession): DataStreamReader =
      spark.readStream.format("kafka").options(options)

    /** Attach + decode to the (key, value, timestamp) string shape
      * every pipeline here consumes (ST3 record metadata; the Kafka
      * source emits binary key/value).
      */
    def load(spark: SparkSession): DataFrame =
      decodeRecords(reader(spark).load())
  }

  /** Publish-side options. `checkpointDir` is the exactly-once ledger
    * (ST2) — same role as the consumer group offsets in the
    * reference.
    */
  final case class SinkConfig(
      bootstrapServers: String,
      topic: String,
      checkpointDir: String) {
    def options: Map[String, String] = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)

    /** The configured (unstarted) writer: rows re-serialized to the
      * (key, value) JSON pair (S9) and aimed at the topic.
      */
    def writer(df: DataFrame, keyCol: String): DataStreamWriter[Row] =
      Pipelines.toKafkaJson(df, keyCol)
        .writeStream.format("kafka").options(options)
  }

  /** Kafka source records → the string (key, value, timestamp) shape
    * [[graft.cdc.Cdc.decode]] and the specs' MemoryStream fixtures
    * share. Works on batch frames too (kafka batch reads have the
    * same schema).
    */
  def decodeRecords(records: DataFrame): DataFrame =
    records.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("timestamp"))

  /** The reference's data-quality processor topology (main.py:206-244:
    * CDC topic → validate/enrich → quality topic) composed from an
    * ALREADY-LOADED record stream — the testable core; MemoryStream
    * in specs, `source.load(spark)` in deployments.
    */
  def qualityTopologyFrom(records: DataFrame, sink: SinkConfig,
      block: Boolean = false): DataStreamWriter[Row] = {
    val enriched = Pipelines.enrichedProjection(
      Pipelines.qualityEnrich(records, block))
    sink.writer(enriched, "doc_id")
  }

  /** Kafka-to-Kafka wiring of the same topology: the deployment
    * entrypoint (requires the kafka connector on the classpath).
    */
  def qualityTopology(spark: SparkSession, source: SourceConfig,
      sink: SinkConfig, block: Boolean = false): DataStreamWriter[Row] =
    qualityTopologyFrom(source.load(spark), sink, block)

  /** Env-driven construction, the reference's deployment contract:
    * KAFKA_BOOTSTRAP_SERVERS + KAFKA_CONSUMER_GROUP + topic names
    * (docker-compose.yml:298-299). Injected as a Map so tests and
    * schedulers don't mutate process env.
    */
  def sourceFromEnv(env: Map[String, String], topicVar: String): SourceConfig =
    SourceConfig(
      bootstrapServers = env("KAFKA_BOOTSTRAP_SERVERS"),
      topic = env(topicVar),
      groupIdPrefix = env.get("KAFKA_CONSUMER_GROUP"),
      startingOffsets = env.getOrElse("KAFKA_STARTING_OFFSETS", "earliest"))
}
