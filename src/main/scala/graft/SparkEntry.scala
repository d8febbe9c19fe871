package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is one operator from SURVEY.md §2 (or a
  * training-data-pipeline extra); `oracleSql` holds the DuckDB
  * equivalent for the hash-match correctness gate. Column names and
  * ordering are aligned on both sides; doubles flow through exact
  * decimal sums (or explicit rounding) so float summation order can
  * never flip a hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StatsOps.viewStats(Tables.events(spark, "/root/testdata/sf0.001"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.4 A1+A2+A3 — per-doc view counter + exact unique visitors
    "q_view_stats" -> ((s, d) => StatsOps.viewStats(Tables.events(s, d))),
    // §2.4 A2 — HLL approximate uniques (no oracle; error-bound spec)
    "q_view_stats_approx" -> ((s, d) => StatsOps.viewStatsApprox(Tables.events(s, d))),
    // §2.4 A1/A3 — event-type rollup with exact-decimal value sum
    "q_event_rollup" -> ((s, d) => StatsOps.eventTypeRollup(Tables.events(s, d))),
    // §2.1 S1 + §2.5 W2/W3 — newest-first listing, page 3 of 20
    "q_list_page" -> ((s, d) => RelationalOps.listPage(Tables.orders(s, d), 40, 20)),
    // §2.1 S2 — point lookup by PK
    "q_point_lookup" -> ((s, d) => RelationalOps.pointLookup(Tables.orders(s, d), 42L)),
    // §2.1 S3 — column-pruned status probe
    "q_status_lookup" -> ((s, d) => RelationalOps.statusLookup(Tables.orders(s, d), 42L)),
    // §2.3 J1 — semi-join existence check
    "q_semi_join" -> ((s, d) => RelationalOps.semiJoinExists(Tables.orders(s, d), Tables.customer(s, d), "BUILDING")),
    // §2.3 J3 — anti-join (orphans / cascade)
    "q_anti_join" -> ((s, d) => RelationalOps.antiJoinOrphans(Tables.customer(s, d), Tables.orders(s, d))),
    // §2.3 — the intended documents⋈signatures equi-join + aggregate
    "q_join_agg" -> ((s, d) => RelationalOps.joinAgg(Tables.orders(s, d), Tables.customer(s, d))),
    // §2.1 S6 — update-as-merge with version bump
    "q_merge_update" -> ((s, d) => RelationalOps.mergeUpdates(Tables.orders(s, d))),
    // §2.5 W1 — top-k with deterministic tiebreak
    "q_topk_customers" -> ((s, d) => RelationalOps.topCustomers(Tables.orders(s, d), 10)),
    // bench headline: scan+agg (TPC-H Q1 shape)
    "q_pricing_summary" -> ((s, d) => RelationalOps.pricingSummary(Tables.lineitem(s, d))),
    // bench headline: multi-way join (TPC-H Q5 shape)
    "q_revenue_by_region" -> ((s, d) => RelationalOps.revenueByRegion(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
      Tables.nation(s, d), Tables.region(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_view_stats" ->
      """SELECT CAST(props->>'$.k' AS BIGINT) AS doc_id,
         count(*) AS total_views,
         count(DISTINCT user_id) AS unique_views
         FROM events WHERE event_type = 'view'
         GROUP BY 1 ORDER BY doc_id""",
    "q_event_rollup" ->
      """SELECT event_type,
         count(*) AS n_events,
         count(DISTINCT user_id) AS n_users,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY event_type""",
    "q_list_page" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
         FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC
         LIMIT 20 OFFSET 40""",
    "q_point_lookup" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
         FROM orders WHERE o_orderkey = 42""",
    "q_status_lookup" ->
      "SELECT o_orderstatus FROM orders WHERE o_orderkey = 42",
    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
         count(DISTINCT o_custkey) AS n_customers,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "q_merge_update" ->
      """SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 10 = 0
              THEN CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         CASE WHEN o_orderkey % 10 = 0 THEN 2 ELSE 1 END AS version
         FROM orders ORDER BY o_orderkey""",
    "q_topk_customers" ->
      """SELECT o_custkey, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM orders GROUP BY 1
         ORDER BY total_value DESC, o_custkey LIMIT 10""",
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(30,8))) AS DOUBLE) AS sum_charge,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""",
    "q_revenue_by_region" ->
      """SELECT r_name,
         CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(24,6))) AS DOUBLE) AS revenue,
         count(DISTINCT o_custkey) AS n_customers
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY r_name""",
  )
}
