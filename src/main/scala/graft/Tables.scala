package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * All queries read through these helpers so that scans stay uniform:
  * plain `spark.read.parquet` gives Catalyst full pushdown/pruning
  * freedom (PushedFilters + ReadSchema reach the parquet scan). At
  * cluster scale the same call reads a partitioned directory tree;
  * nothing here assumes single-file inputs.
  */
object Tables {
  /** The driver-generated tables are immutable for a session's
    * lifetime, so the resolved relation (file listing + footer
    * schema) is shared per (session, path): a 50-query batch pays
    * the listing/schema cost once per table instead of once per
    * query. Keyed by session so stopped sessions can't leak frames
    * into live ones; non-standard paths (anything a caller might
    * overwrite mid-session) bypass the cache.
    */
  private val standardNames = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")
  private val relationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  SessionCaches.register(relationCache)

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (standardNames(name)) {
      SessionCaches.ensureHook(spark)
      relationCache.computeIfAbsent((spark, path), kv => kv._1.read.parquet(kv._2))
    } else spark.read.parquet(path)
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  // Typed loaders — metadata-only `as[T]` over the same scans (case
  // classes in graft.schema mirror the parquet schemas exactly), for
  // call sites that want compile-time field safety.
  def documentsDs(s: SparkSession, d: String): Dataset[graft.schema.Document] = {
    import s.implicits._
    documents(s, d).as[graft.schema.Document]
  }
  def eventsDs(s: SparkSession, d: String): Dataset[graft.schema.Event] = {
    import s.implicits._
    events(s, d).as[graft.schema.Event]
  }
  def embeddingsDs(s: SparkSession, d: String): Dataset[graft.schema.Embedding] = {
    import s.implicits._
    embeddings(s, d).as[graft.schema.Embedding]
  }
  def ordersDs(s: SparkSession, d: String): Dataset[graft.schema.Order] = {
    import s.implicits._
    orders(s, d).as[graft.schema.Order]
  }
}
