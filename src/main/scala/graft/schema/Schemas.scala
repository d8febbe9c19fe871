package graft.schema

/** Case-class schemas for the driver tables (SURVEY §7.1 item 1) —
  * the single source of truth for the typed `Dataset[T]` surface.
  * Field names and types mirror the parquet files exactly so
  * `as[T]` is a metadata-only cast (no extra projection, scans stay
  * columnar); `TypedTablesSpec` pins that equivalence.
  *
  * Use the typed loaders (Tables.documentsDs etc.) where compile-time
  * field safety helps (flatMap/mapPartitions logic, streaming state);
  * stay on DataFrame where the schema is dynamic (generic operators).
  */
final case class Document(doc_id: Long, text: String, lang: String,
  source: String, n_chars: Long)

/** events.ts is epoch-nano Long by repo contract: `Tables.events`
  * normalizes whatever the parquet carries (TIMESTAMP(NANOS) under
  * nanosAsLong, or TIMESTAMP_MICROS/NTZ) to that Long.
  * `TextFunctions.eventTs` converts when timestamp semantics are
  * needed.
  */
final case class Event(event_id: Long, ts: Long, user_id: Long,
  event_type: String, value: Double, props: String)

final case class Embedding(vec_id: Long, embedding: Array[Float],
  label: Int)

final case class Order(o_orderkey: Long, o_custkey: Long,
  o_orderstatus: String, o_totalprice: Double,
  o_orderdate: java.sql.Timestamp, o_orderpriority: String)
