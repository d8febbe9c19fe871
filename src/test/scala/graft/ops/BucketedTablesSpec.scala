package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class BucketedTablesSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bucketed-on-key join and aggregation plan zero exchanges") {
    val docs = Tables.documents(spark, sfDir)
    val stats = docs.select(col("doc_id"), col("n_chars"))
    BucketedTables.writeBucketed(docs.select("doc_id", "text", "lang"),
      "b_docs", "doc_id", 4)
    BucketedTables.writeBucketed(stats, "b_stats", "doc_id", 4)
    try {
      val l = BucketedTables.readTable(spark, "b_docs")
      val r = BucketedTables.readTable(spark, "b_stats")
      // turn the broadcast path off so the co-located layout is what
      // the planner must lean on — at 100 TB neither side broadcasts
      val joined = l.hint("merge").join(r, "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val pj = plan(joined)
      assert(!pj.contains("Exchange"), pj)
      assert(joined.count() === docs.count())
      // aggregation on the bucket key also rides the layout
      val agged = l.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val pa = plan(agged)
      assert(!pa.contains("Exchange"), pa)
      // and the same join read as BARE PARQUET (layout forgotten)
      // must shuffle — the catalog is load-bearing, not decorative
      val bare = spark.read.parquet(warehousePath("b_docs"))
      val pb = plan(bare.hint("merge").join(r, "doc_id")
        .select(col("doc_id"), col("n_chars")))
      assert(pb.contains("Exchange"), pb)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_stats")
    }
  }

  test("writeBucketed reclaims a dangling managed location (metadata " +
      "died with an earlier session, files survived) instead of " +
      "failing LOCATION_ALREADY_EXISTS") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
    // forge the cross-session wreck: location exists, catalog entry
    // doesn't — exactly what a killed JVM leaves in the warehouse
    spark.sql("DROP TABLE IF EXISTS b_dangling")
    val dir = new java.io.File(warehousePath("b_dangling"))
    dir.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(dir, "stale-file").toPath, "left by a dead run")
    try {
      BucketedTables.writeBucketed(docs, "b_dangling", "doc_id", 4)
      assert(BucketedTables.readTable(spark, "b_dangling").count()
        === docs.count())
      assert(!new java.io.File(dir, "stale-file").exists())
    } finally spark.sql("DROP TABLE IF EXISTS b_dangling")
  }

  private def warehousePath(table: String): String = {
    val base = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    s"$base/$table"
  }
}
