package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SkewAndBucketingSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = Tables.orders(spark, sfDir)
  lazy val customer = Tables.customer(spark, sfDir)

  test("salted join is row-identical to the plain join") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, String)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq.sorted
    val plain = rows(
      orders.join(customer, orders("o_custkey") === customer("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_mktsegment"))
    val salted = rows(Skew.saltedJoin(
      orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", saltFactor = 8)
      .select("o_orderkey", "o_custkey", "c_mktsegment"))
    assert(plain === salted)
  }

  test("salted two-phase count matches plain count per key") {
    val plain = orders.groupBy($"o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(orders, $"o_custkey",
      pmod(xxhash64($"o_orderkey"), lit(16)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    orders.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    Tables.lineitem(spark, sfDir).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("lineitem_bucketed")
        .join(spark.table("orders_bucketed"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity"))
      // pre-AQE physical plan: bucketed scans join without any
      // ShuffleExchange — the bucketing IS the shuffle, done at write
      val p = j.queryExecution.sparkPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"), p)
      // and it computes the same result as the unbucketed join
      val plain = Tables.lineitem(spark, sfDir)
        .join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(sum($"l_quantity"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val bucketed = j.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(bucketed === plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
