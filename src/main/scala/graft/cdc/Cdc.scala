package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium-style CDC envelope handling — SURVEY.md §1.3/§2.1 S7,
  * §2.2 P1-P4. The reference consumes `{op, before, after, ts_ms}`
  * JSON with schemas disabled (debezium/register-postgres.json:19-22;
  * consumer services/data-quality/app/main.py:83-99).
  *
  * `from_json` with a fixed StructType mirrors `schemas.enable=false`
  * exactly: no inference, malformed records surface as nulls (the
  * reference's log-and-drop error channel, ST6). All ops here are
  * narrow (no shuffle) and identical between batch DataFrames and
  * streaming DataFrames — the streaming pipeline reuses these
  * functions verbatim (transform parity, SURVEY §7.5.5).
  */
object Cdc {

  /** The row payload carried in before/after. Mirrors the document
    * row (FIXTURES.md §1) shaped onto the driver documents table.
    */
  val rowSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("status", StringType),
    StructField("version", IntegerType),
    StructField("s3_key", StringType)))

  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("before", rowSchema),
    StructField("after", rowSchema),
    StructField("ts_ms", LongType)))

  /** Deterministic op assignment used to synthesize an envelope
    * stream from the documents table: 5% deletes, 5% snapshot reads,
    * 45% creates, 45% updates.
    */
  def syntheticOp(id: Column): Column =
    when(id % 20 === 0, "d")
      .when(id % 20 === 1, "r")
      .when(id % 2 === 0, "c")
      .otherwise("u")

  /** Build a JSON envelope stream from the documents table — the
    * test-side stand-in for the Kafka `cdc.documents` topic (S7/S8).
    * Output schema matches a Kafka source: key, value (JSON string),
    * timestamp.
    */
  def syntheticEnvelopes(documents: DataFrame): DataFrame = {
    val op = syntheticOp(col("doc_id"))
    val row = struct(
      col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"),
      lit(null).cast(StringType).as("status"),
      lit(null).cast(IntegerType).as("version"),
      concat(col("doc_id"), lit("/content")).as("s3_key"))
    documents.select(
      col("doc_id").cast(StringType).as("key"),
      to_json(struct(
        op.as("op"),
        when(op === "u", row).otherwise(lit(null).cast(rowSchema)).as("before"),
        when(op =!= "d", row).otherwise(lit(null).cast(rowSchema)).as("after"),
        (col("doc_id") * 1000L).as("ts_ms"))).as("value"),
      // the Kafka record timestamp the documented contract promises —
      // derived from the same deterministic ts_ms as the envelope
      timestamp_millis(col("doc_id") * 1000L).as("timestamp"))
  }

  /** S7/S8 decode: JSON envelope → typed columns. */
  def decode(kafkaLike: DataFrame): DataFrame =
    kafkaLike.select(col("key"),
      from_json(col("value"), envelopeSchema).as("env"))

  /** P1: drop snapshot reads + deletes (event/app/main.py:37-40). */
  def opFilter(decoded: DataFrame): DataFrame =
    decoded.filter(!col("env.op").isin("r", "d"))

  /** P3: skip events without a payload key
    * (data-quality/app/main.py:93-97).
    */
  def requirePayload(decoded: DataFrame): DataFrame =
    decoded.filter(col("env.after.s3_key").isNotNull)

  /** P4: flatten after.* with the event-processor's defaults
    * (event/app/main.py:44-61: status→created, version→1,
    * content_size→0).
    */
  def flatten(decoded: DataFrame): DataFrame =
    decoded.select(
      col("env.op").as("op"),
      col("env.after.doc_id").as("doc_id"),
      col("env.after.text").as("text"),
      col("env.after.lang").as("lang"),
      col("env.after.source").as("source"),
      coalesce(col("env.after.n_chars"), lit(0L)).as("content_size"),
      coalesce(col("env.after.status"), lit("created")).as("status"),
      coalesce(col("env.after.version"), lit(1)).as("version"),
      col("env.after.s3_key").as("s3_key"),
      col("env.ts_ms").as("ts_ms"))

  /** The full batch CDC decode pipeline (S7+P1+P3+P4) — also the
    * streaming transform (applied unchanged to a readStream frame).
    */
  def pipeline(envelopes: DataFrame): DataFrame =
    flatten(requirePayload(opFilter(decode(envelopes))))
}
