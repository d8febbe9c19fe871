package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class CacheOpsSpec extends SparkSpec {

  private val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
  private val ttl = java.time.Duration.ofSeconds(300) // the reference's 300 s

  // a base relation that EXPLODES if the plan ever evaluates it —
  // proof that cache hits never touch the base table
  private def poisonedBase = spark.read.parquet("/nonexistent/base.parquet")

  test("unexpired hit serves from the snapshot without touching base") {
    val orders = Tables.orders(spark, sfDir)
    val someKey = orders.select("o_orderkey").head.getLong(0)
    val snap = CacheOps.snapshot(
      orders.filter(col("o_orderkey") === someKey), t0, ttl)
    try {
      val served = CacheOps.readThrough(snap, poisonedBase, "o_orderkey",
        lit(someKey), t0.plusSeconds(60)) // within TTL
      assert(served.count() === 1)
      assert(served.columns.toSeq === orders.columns.toSeq) // no metadata leak
    } finally snap.unpersist()
  }

  test("expired entry falls back to the base point lookup") {
    val orders = Tables.orders(spark, sfDir)
    val someKey = orders.select("o_orderkey").head.getLong(0)
    val snap = CacheOps.snapshot(
      orders.filter(col("o_orderkey") === someKey), t0, ttl)
    try {
      val served = CacheOps.readThrough(snap, orders, "o_orderkey",
        lit(someKey), t0.plusSeconds(301)) // past TTL
      assert(served.count() === 1) // same row, from base
      // and a poisoned base now DOES fail — the fallback is real
      intercept[Exception] {
        CacheOps.readThrough(snap, poisonedBase, "o_orderkey",
          lit(someKey), t0.plusSeconds(301)).count()
      }
    } finally snap.unpersist()
  }

  test("miss on an uncached key goes to base") {
    val orders = Tables.orders(spark, sfDir)
    val keys = orders.select("o_orderkey").limit(2).collect().map(_.getLong(0))
    val snap = CacheOps.snapshot(
      orders.filter(col("o_orderkey") === keys(0)), t0, ttl)
    try {
      val served = CacheOps.readThrough(snap, orders, "o_orderkey",
        lit(keys(1)), t0.plusSeconds(1))
      assert(served.count() === 1)
      assert(served.head.getAs[Long]("o_orderkey") === keys(1))
    } finally snap.unpersist()
  }

  test("merge invalidates its keys: next lookup reads the merged row") {
    val orders = Tables.orders(spark, sfDir)
    // a key the deterministic merge updates (o_orderkey % 10 == 0)
    val updKey = orders.filter(col("o_orderkey") % 10 === 0)
      .select("o_orderkey").head.getLong(0)
    val stale = CacheOps.snapshot(
      orders.filter(col("o_orderkey") === updKey), t0, ttl)
    try {
      val merged = RelationalOps.mergeUpdates(orders)
      val updatedKeys = merged.filter(col("version") === 2).select("o_orderkey")
      val snap2 = CacheOps.invalidate(stale, updatedKeys, "o_orderkey")
      // the invalidated key is gone from the snapshot...
      assert(CacheOps.fresh(snap2, t0.plusSeconds(1))
        .filter(col("o_orderkey") === updKey).isEmpty)
      // ...so the read-through serves the MERGED row, not the stale one
      val served = CacheOps.readThrough(snap2, merged, "o_orderkey",
        lit(updKey), t0.plusSeconds(1))
      assert(served.head.getAs[String]("o_orderstatus") === "U")
    } finally stale.unpersist()
  }
}
