package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's relational surface re-expressed Spark-first.
  *
  * Coverage (SURVEY.md §2): S1 list+sort+paginate, S2 point lookup,
  * S3 column-pruned lookup, S6 update-as-merge, J1 semi-join
  * existence check, J3 anti-join cascade, W1 top-k, W2 offset
  * pagination, W3 newest-first ordering.
  *
  * Scale notes (100 TB):
  *  - Point lookups (S2/S3) are `filter` on the key column — Catalyst
  *    pushes the predicate into the parquet scan (`PushedFilters`),
  *    so row-group min/max statistics skip nearly all data when the
  *    table is written sorted/bucketed by key (the reference's PK
  *    index equivalent; cf. scripts/init-db.sql:58-70).
  *  - Semi/anti joins broadcast the filtered dimension side when it
  *    fits `autoBroadcastJoinThreshold`; otherwise Catalyst falls
  *    back to shuffled hash — no driver-side collect anywhere. To
  *    keep that fallback real, explicit broadcast() hints appear ONLY
  *    on bounded-cardinality dims (nation/region: ≤ 25 rows at every
  *    TPC-H scale factor); unbounded sides (customer) are left to the
  *    threshold + AQE, since a hint would force the broadcast and
  *    fail hard past Spark's 8 GB limit instead of falling back.
  *  - Pagination is a global sort only at page-serving time; at
  *    cluster scale the table is written sorted-within-partitions by
  *    the pagination key (W3's composite-index equivalent) and
  *    `orderBy` + `limit` becomes a TakeOrdered top-k, which Spark
  *    executes as per-partition heaps + single merge — no full sort
  *    and no full shuffle.
  */
object RelationalOps {

  /** S1+W2+W3: newest-first listing with offset/limit pagination
    * (reference services/document/app/main.py:93-99). Ties broken by
    * key so pages are deterministic and disjoint.
    */
  def listPage(orders: DataFrame, skip: Int, pageSize: Int): DataFrame =
    orders
      .select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        // ISO string, not DateType: hash-stable across engines
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .offset(skip)
      .limit(pageSize)

  /** S2: point lookup by primary key (reference main.py:119-120). */
  def pointLookup(orders: DataFrame, key: Long): DataFrame =
    orders
      .filter(col("o_orderkey") === lit(key))
      .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd"))

  /** S3: single-column existence/status probe (reference
    * grpc_servicer.py:107-110) — column pruning reaches the scan.
    */
  def statusLookup(orders: DataFrame, key: Long): DataFrame =
    orders.filter(col("o_orderkey") === lit(key)).select(col("o_orderstatus"))

  /** J1: semi-join existence check — the signature-insert FK guard
    * (reference grpc_servicer.py:95-120; FK init-db.sql:55). Orders
    * standing in for signatures, customers-in-segment for documents.
    */
  def semiJoinExists(orders: DataFrame, customer: DataFrame, segment: String): DataFrame =
    orders
      .join(
        customer.filter(col("c_mktsegment") === segment)
          .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey"))

  /** J1 rejects / J3 cascade: anti-join (reference init-db.sql:55
    * ON DELETE CASCADE) — keys with no match on the other side.
    */
  def antiJoinOrphans(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_orderstatus") === "F").select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** The intended documents⋈signatures equi-join (init-db.sql:66-67)
    * as a join+aggregate: order volume per market segment. Broadcast
    * dim side; decimal-exact money sum for oracle parity.
    */
  def joinAgg(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("c_mktsegment"))

  /** S6: update-as-merge. Spark has no in-place UPDATE; the idiom
    * (same as Delta MERGE's shuffle plan) is
    * `target ANTI-JOIN updates  UNION ALL  updates-applied`.
    * Updates here are derived deterministically (keys ≡ 0 mod 10 get
    * a 10% price bump and a status flip), mirroring the reference's
    * PATCH + version+1 (main.py:144-158).
    *
    * F8 auto-touch: updated rows are stamped `updated_at` from the
    * INJECTED clock (the reference's updated_at trigger,
    * scripts/init-db.sql:80-93 / models.py onupdate). The clock is a
    * parameter — never wall time — so the merge stays deterministic,
    * replayable, and oracle-able; untouched rows keep a null stamp,
    * exactly like rows the trigger never fired on.
    */
  def mergeUpdates(orders: DataFrame,
      clock: Option[java.time.Instant] = None): DataFrame = {
    val stamp = clock
      .map(c => lit(java.time.format.DateTimeFormatter.ISO_INSTANT.format(
        c.truncatedTo(java.time.temporal.ChronoUnit.SECONDS))))
      .getOrElse(lit(null)).cast("string")
    val base = orders.select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val isUpd = col("o_orderkey") % 10 === 0
    val updates = base.filter(isUpd)
      // decimal-exact 10% bump: double×double rounding differs between
      // engines near .xx5 boundaries; decimal×decimal never does
      .withColumn("o_totalprice",
        round(col("o_totalprice").cast("decimal(18,2)") *
          lit(BigDecimal("1.1")), 2).cast("double"))
      .withColumn("o_orderstatus", lit("U"))
    base.filter(!isUpd)
      .unionByName(updates)
      // version from the update predicate itself, not the status
      // sentinel: a pre-existing 'U' row must not be stamped updated
      .withColumn("version", when(isUpd, 2).otherwise(1))
      .withColumn("updated_at", when(isUpd, stamp).otherwise(lit(null).cast("string")))
      .orderBy(col("o_orderkey"))
  }

  /** W1: top-k with deterministic tiebreak (reference
    * search/app/main.py:110-119 sorts score desc, created_at desc).
    * Compiles to TakeOrdered — per-partition heaps, no global sort.
    */
  def topCustomers(orders: DataFrame, k: Int): DataFrame =
    orders
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("total_value").desc, col("o_custkey"))
      .limit(k)

  /** TPC-H Q1-shaped pricing summary over lineitem — the bench
    * headline for scan+agg throughput. Decimal-exact sums. The two
    * high-precision totals surface as exact decimal STRINGS: past
    * ~16 significant digits (sum_charge crosses that at sf0.1
    * already) a decimal→double cast rounds its last ulp differently
    * across engines, so the comparison stays in exact decimal space.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val qty = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val tax = col("l_tax").cast("decimal(18,2)")
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum((price * (lit(1) - disc)).cast("decimal(24,6)")).cast("string")
          .as("sum_disc_price"),
        sum((price * (lit(1) - disc) * (lit(1) + tax)).cast("decimal(30,8)"))
          .cast("string").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** CUBE grouping sets: all (status × priority) combinations plus
    * every subtotal margin and the grand total.
    */
  def statusPriorityCube(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** §2.6 set operations (free from Spark, verified here): customers
    * in a segment INTERSECT customers with open orders, and EXCEPT
    * for the complement — distinct set semantics.
    */
  def setOps(customer: DataFrame, orders: DataFrame): DataFrame = {
    val inSegment = customer.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val withOpen = orders.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val both = inSegment.intersect(withOpen)
      .withColumn("set_op", lit("intersect"))
    val onlySegment = inSegment.except(withOpen)
      .withColumn("set_op", lit("except"))
    both.unionByName(onlySegment)
      .orderBy(col("set_op"), col("c_custkey"))
  }

  /** TPC-H Q5-shaped multi-way join: revenue per region. Dimension
    * chain (region→nation→customer) broadcasts; the single big
    * shuffle is lineitem⋈orders on orderkey.
    */
  def revenueByRegion(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    lineitem
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(24,6)").as("rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      // no hint: the customer-derived side must be free to fall back
      // to a shuffled join past the broadcast threshold
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"))
      .agg(
        // exact decimal string: a region's revenue crosses double's
        // ~16 significant digits within one scale-factor step of the
        // verified range (same reasoning as pricingSummary)
        sum(col("rev")).cast("string").as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))
      .orderBy(col("r_name"))
  }
}
