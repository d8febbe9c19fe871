package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** View-analytics aggregations — the engine's equivalent of the
  * reference's Redis counters and HyperLogLog sketches
  * (reference: services/document/app/db/cache.py:81-101 `INCR
  * views:{id}` / `PFADD unique_views:{id}`, readout
  * services/document/app/main.py:162-168).
  *
  * The reference keeps this state incrementally in Redis; Spark-first
  * the same result is one hash aggregate with a map-side partial —
  * `groupBy(key).agg(count, countDistinct)` compiles to
  * partial_count + partial_distinct before the single shuffle on the
  * group key, so at 100 TB each executor reduces its own split first
  * and only per-key partials move. The approximate variant uses
  * HLL++ (`approx_count_distinct`), which is the direct analogue of
  * Redis PFADD/PFCOUNT and shuffles O(groups · sketch) bytes
  * regardless of visitor cardinality.
  */
object StatsOps {

  /** The `events.props` JSON carries the viewed-document key `k`
    * (TESTDATA events.props = {"k": <int>}); user_id plays client_ip.
    */
  def docKey(props: Column): Column =
    get_json_object(props, "$.k").cast("long")

  /** A1+A2+A3: per-document total views + exact unique visitors. */
  def viewStats(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "view")
      .select(docKey(col("props")).as("doc_id"), col("user_id"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("total_views"),
        countDistinct(col("user_id")).as("unique_views"))
      .orderBy(col("doc_id"))

  /** A2 approximate variant — mergeable-sketch parity with Redis HLL.
    * No DuckDB oracle (approx ≠ approx across engines); its ScalaTest
    * spec asserts relative error vs the exact count instead.
    */
  def viewStatsApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events
      .filter(col("event_type") === "view")
      .select(docKey(col("props")).as("doc_id"), col("user_id"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("total_views"),
        approx_count_distinct(col("user_id"), rsd).as("approx_unique_views"))
      .orderBy(col("doc_id"))

  /** A2 with full Redis-PFMERGE parity: mergeable HLL sketches.
    * Each half of the traffic builds its own sketch (hll_sketch_agg);
    * hll_union_agg merges them — the estimate must equal building
    * one sketch over everything (associative state, like PFADD
    * shards merged with PFMERGE). At 100 TB this is what makes
    * distinct counting embarrassingly parallel: partials merge, raw
    * visitor ids never re-shuffle.
    */
  def viewStatsSketched(events: DataFrame): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select(docKey(col("props")).as("doc_id"), col("user_id"))
    val halves = views
      .withColumn("shard", col("user_id") % 2)
      .groupBy(col("doc_id"), col("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"))
    halves
      .groupBy(col("doc_id"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("unique_views_merged"))
      .orderBy(col("doc_id"))
  }

  /** Exact per-group percentiles (linear interpolation) of the event
    * value — the distribution readout a quality dashboard needs next
    * to the counters above. Exact `percentile` is a sort-based
    * aggregate: per-group state is the value multiset, so it shuffles
    * more than a sketch; the approx path at 100 TB is
    * `percentile_approx` (mergeable t-digest-style state), offered
    * alongside. Results round to 4 places so interpolation ulps can't
    * flip an engine comparison.
    */
  def valuePercentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
      .orderBy(col("event_type"))

  /** Sketch-based percentiles (t-digest-family `approx_percentile`):
    * the 100 TB path when exact interpolation's full sort-per-group
    * is too much — the sketch is mergeable, so partial aggregation
    * applies and only fixed-size sketches shuffle. Accuracy bound by
    * `accuracy` (1/accuracy relative rank error); spec'd against the
    * exact percentiles rather than oracled (sketch internals are
    * engine-specific by design).
    */
  def valuePercentilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        round(expr(s"approx_percentile(value, 0.5, $accuracy)"), 4).as("p50"),
        round(expr(s"approx_percentile(value, 0.9, $accuracy)"), 4).as("p90"),
        round(expr(s"approx_percentile(value, 0.99, $accuracy)"), 4).as("p99"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
      .orderBy(col("event_type"))

  /** A1/A3 over all event types: per-type event counts + value sum
    * (exact-decimal sum so the DuckDB oracle hash-matches bit-for-bit
    * regardless of float summation order).
    */
  def eventTypeRollup(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("event_type"))

  /** Recency-weighted value rollup with exponential time decay — the
    * "trending" readout (Redis decayed-counter analog): each event
    * contributes value·2^(−age/halfLife), so yesterday's purchase
    * counts half as much as today's at a 24 h half-life. The
    * reference time is the corpus max timestamp (deterministic — a
    * wall clock would unhash the oracle).
    *
    * Cross-engine contract: the exponent is a division of exact
    * integer micros (identical doubles), pow is libm so each term
    * rounds to integer MICRO-value before the (exact long, order-
    * independent) sum — the LM micro-nat pattern.
    *
    * Scale shape: one broadcast scalar (max ts) + a narrow term
    * projection + one aggregation keyed by event type with map-side
    * combine. Decay never re-reads history: re-scoring tomorrow is
    * the same one-pass job, which is why the decayed form beats a
    * windowed count at 100 TB.
    */
  def trendingByType(events: DataFrame,
      halfLifeUs: Long = 86400000000L): DataFrame =
    trendingState(events, halfLifeUs)
      .select(col("event_type"), col("n_events"),
        round(col("score6") / 1e6, 4).as("decayed_value"))
      .orderBy(col("event_type"))

  /** [[trendingByType]] in its mergeable STATE form: the decayed sum
    * kept as integer micro-value (`score6`) plus the anchor timestamp
    * it is valued at — the representation [[mergeTrendingStates]] can
    * re-anchor and combine, which is what incremental/streaming
    * trending persists between batches.
    */
  def trendingState(events: DataFrame,
      halfLifeUs: Long = 86400000000L): DataFrame = {
    require(halfLifeUs > 0, s"half-life must be positive: $halfLifeUs")
    val tus = expr("ts div 1000")
    val tmax = events.agg(max(tus).as("anchor_us"))
    events
      .select(col("event_type"), col("value"), tus.as("__tus"))
      .crossJoin(broadcast(tmax))
      .withColumn("__term6",
        round(col("value") *
          pow(lit(2.0),
            (col("__tus") - col("anchor_us")) / lit(halfLifeUs.toDouble)) *
          1e6).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__term6")).as("score6"),
        max(col("anchor_us")).as("anchor_us"))
  }

  /** Merge two trending states: both sides re-anchor to the later of
    * the two anchors (each accumulated micro-score decays by its
    * anchor gap, one rounding per side) and add with exact long
    * arithmetic. Associative up to ±1 micro-value per merge — the
    * drift bound incremental trending carries; the one-shot batch
    * recompute stays the exact reference.
    */
  def mergeTrendingStates(a: DataFrame, b: DataFrame,
      halfLifeUs: Long = 86400000000L): DataFrame = {
    require(halfLifeUs > 0, s"half-life must be positive: $halfLifeUs")
    val aAnchor = a.agg(max(col("anchor_us")).as("__aa"))
    val bAnchor = b.agg(max(col("anchor_us")).as("__ba"))
    def side(df: DataFrame, anchor: Column, suffix: String) =
      df.select(col("event_type"),
        col("n_events").as(s"__n$suffix"),
        col("score6").as(s"__s$suffix"),
        anchor.as(s"__t$suffix"))
    // an empty side contributes a null anchor; the other side's wins
    val joined = side(a, col("anchor_us"), "a")
      .join(side(b, col("anchor_us"), "b"), Seq("event_type"), "full_outer")
      .crossJoin(broadcast(aAnchor)).crossJoin(broadcast(bAnchor))
      .withColumn("anchor_us",
        greatest(coalesce(col("__aa"), col("__ba")),
          coalesce(col("__ba"), col("__aa"))))
    def decayed(s: String) = coalesce(
      round(col(s"__s$s") *
        pow(lit(2.0),
          (col(s"__t$s") - col("anchor_us")) / lit(halfLifeUs.toDouble)))
        .cast("long"), lit(0L))
    joined.select(
      col("event_type"),
      (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L)))
        .as("n_events"),
      (decayed("a") + decayed("b")).as("score6"),
      col("anchor_us"))
  }
}
