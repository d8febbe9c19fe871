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
  )
}
