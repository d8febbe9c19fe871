package graft.schema

import graft.{SparkSpec, Tables}

class TypedTablesSpec extends SparkSpec {

  test("typed loaders read every table; fields match the untyped scan") {
    val docs = Tables.documentsDs(spark, sfDir).collect()
    assert(docs.nonEmpty)
    val first = Tables.documents(spark, sfDir)
      .orderBy("doc_id").head
    val firstTyped = docs.minBy(_.doc_id)
    assert(firstTyped.doc_id === first.getLong(0))
    assert(firstTyped.text === first.getString(1))

    assert(Tables.eventsDs(spark, sfDir).head.event_id >= 0L)
    assert(Tables.embeddingsDs(spark, sfDir).head.embedding.nonEmpty)
    assert(Tables.ordersDs(spark, sfDir).head.o_orderkey >= 0L)
  }

  test("as[T] is metadata-only: the typed plan still prunes columns") {
    import org.apache.spark.sql.functions.col
    val pruned = Tables.documentsDs(spark, sfDir)
      .select(col("doc_id"))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("typed flatMap compiles against the case class (field safety)") {
    import spark.implicits._
    val n = Tables.documentsDs(spark, sfDir)
      .flatMap(d => if (d.n_chars > 0) Some(d.doc_id) else None)
      .count()
    assert(n > 0)
  }
}
