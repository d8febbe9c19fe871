package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class RelationalOpsSpec extends SparkSpec {

  lazy val orders = Tables.orders(spark, sfDir)
  lazy val customer = Tables.customer(spark, sfDir)

  test("pagination pages are disjoint and complete") {
    val p1 = RelationalOps.listPage(orders, 0, 20).collect().map(_.getLong(0))
    val p2 = RelationalOps.listPage(orders, 20, 20).collect().map(_.getLong(0))
    assert(p1.length === 20 && p2.length === 20)
    assert(p1.toSet.intersect(p2.toSet).isEmpty)
    // page 1+2 == first 40 of the ordered listing
    val both = RelationalOps.listPage(orders, 0, 40).collect().map(_.getLong(0))
    assert((p1 ++ p2).toSeq === both.toSeq)
  }

  test("point lookup returns exactly the keyed row") {
    val r = RelationalOps.pointLookup(orders, 42L).collect()
    assert(r.length === 1 && r(0).getAs[Long]("o_orderkey") === 42L)
  }

  test("semi ∪ anti partitions the left side") {
    val semi = orders.join(
      customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    val anti = orders.join(
      customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey"),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(semi + anti === orders.count())
    assert(RelationalOps.semiJoinExists(orders, customer, "BUILDING").count() === semi)
  }

  test("merge preserves row count and bumps only updated keys") {
    val merged = RelationalOps.mergeUpdates(orders)
    assert(merged.count() === orders.count())
    val v2 = merged.filter(col("version") === 2)
    assert(v2.filter(col("o_orderkey") % 10 =!= 0).count() === 0)
    assert(v2.count() === orders.filter(col("o_orderkey") % 10 === 0).count())
    // no clock injected → no auto-touch stamps anywhere
    assert(merged.filter(col("updated_at").isNotNull).count() === 0)
  }

  test("merge auto-touches updated rows from the injected clock (F8)") {
    val clock = java.time.Instant.parse("2024-03-01T12:00:00Z")
    val merged = RelationalOps.mergeUpdates(orders, Some(clock))
    // exactly the updated rows carry the stamp, and it IS the clock
    val stamped = merged.filter(col("updated_at").isNotNull)
    assert(stamped.count() === merged.filter(col("version") === 2).count())
    assert(stamped.filter(col("version") =!= 2).count() === 0)
    assert(stamped.select("updated_at").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("2024-03-01T12:00:00Z"))
  }

  test("topCustomers ordered by value desc") {
    val vals = RelationalOps.topCustomers(orders, 10).collect().map(_.getDouble(2))
    assert(vals.sorted(Ordering[Double].reverse).toSeq === vals.toSeq)
  }

  test("pricing summary groups cover filtered lineitem") {
    val li = Tables.lineitem(spark, sfDir)
    val rows = RelationalOps.pricingSummary(li).collect()
    val n = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(rows.map(_.getAs[Long]("count_order")).sum === n)
  }
}
