package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Clickstream time analytics: sessionization, hourly rollups,
  * running/lag window functions, and hierarchical rollups.
  *
  * The events table's `ts` arrives as epoch-NANO Long (normalized
  * by `Tables.events`). All time math here runs on integer
  * MICROseconds (`ts div 1000`): DuckDB coerces TIMESTAMP_NS to
  * microsecond TIMESTAMP by truncation, so µs is the finest
  * engine-portable granularity — and integer division keeps it
  * exact.
  *
  * Scale notes: sessionization is ONE shuffle (partition by user),
  * then all window work is within-partition streams; per-user event
  * counts are small so no skew handling is needed — a pathological
  * bot user would be salted upstream. Hourly rollup is a plain
  * partial+final hash agg keyed (hour, type).
  */
object SessionOps {

  val SessionGapMicros: Long = 30L * 60 * 1000 * 1000 // 30 min

  /** Engine-portable event time: epoch micros (see class doc). */
  private val tus = expr("ts div 1000")

  /** Assign session indices per user: a gap > `gapNanos` starts a new
    * session (classic lag + cumulative-sum-of-boundaries).
    */
  def sessionize(events: DataFrame, gapMicros: Long = SessionGapMicros): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    // the lag of the first row is null; the comparison is then null
    // and otherwise(0) maps it to 0 — no separate coalesce needed
    val isNew = when(
      col("tus") - lag(col("tus"), 1).over(byUser) > gapMicros, 1)
      .otherwise(0)
    events
      .withColumn("tus", tus)
      .withColumn("new_session", isNew)
      .withColumn("session_idx",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("new_session")
  }

  /** Per-session stats: bounds, size, duration, exact value sum. */
  def sessionStats(events: DataFrame, gapMicros: Long = SessionGapMicros): DataFrame =
    sessionize(events, gapMicros)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event"),
        // floor, not cast: CAST(double AS BIGINT) truncates in Spark
        // but ROUNDS in DuckDB — floor() agrees everywhere
        floor((max(col("tus")) - min(col("tus"))) / lit(1000L)).cast("long")
          .as("duration_ms"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_idx"))

  /** Hourly event rollup — the canonical clickstream aggregation.
    * Hour derived from nanos by integer division (exact).
    */
  def hourlyRollup(events: DataFrame): DataFrame = {
    // integer `div`, not double division: epoch-nanos exceed the
    // 2^53 exact-double range, so a double round-trip can drift a
    // second at the hour boundary
    val hourSec = expr("((ts div 1000) div 3600000000) * 3600")
    events
      .groupBy(
        from_unixtime(hourSec, "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Window-function surface: running per-user value totals and
    * previous-event gaps (lag) — frame-spec'd aggregation within the
    * single user-partition shuffle.
    */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("tus"), col("event_id"))
    events.withColumn("tus", tus).select(
      col("user_id"), col("event_id"),
      sum(col("value").cast("decimal(18,2)"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("running_value"),
      row_number().over(byUser).as("event_seq"),
      floor((col("tus") - lag(col("tus"), 1).over(byUser)) / lit(1000L))
        .cast("long").as("gap_ms"))
      .orderBy(col("user_id"), col("event_seq"))
  }

  /** Window ranking extras: balance deciles (ntile) and per-nation
    * extremes via first/last_value over the full-partition frame.
    */
  /** Conversion funnel: how many users complete each prefix of an
    * ordered step sequence, where step k+1 must happen STRICTLY after
    * the user's earliest completion of step k (the classic funnel
    * semantics — min-ts chaining, not mere per-type minima, so a
    * click that precedes every view does not convert).
    *
    * Scale shape: one hash aggregation on the user id per step, each
    * stage frame a shrinking subset of the last; the event scan is
    * pruned to the step's type by a pushed filter each pass. The
    * per-stage counts are single-row aggregates unioned into the
    * k-row readout. k passes over a pruned scan beats one
    * sort-per-user over all events once users are heavy.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      maxStepGapMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate funnel step: $steps")
    require(maxStepGapMicros.forall(_ > 0), s"gap bound must be positive")
    def stageCount(stage: DataFrame, i: Int, step: String) =
      stage.agg(count(lit(1)).as("n_users"))
        .select(lit(i).as("stage"), lit(step).as("step"), col("n_users"))
    var stage = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(tus).as("t"))
    val counts = Seq.newBuilder[DataFrame]
    counts += stageCount(stage, 1, steps.head)
    steps.tail.zipWithIndex.foreach { case (step, i) =>
      // strictly after the previous step's earliest completion — and,
      // when bounded, within the allowed gap of it ("convert within
      // 7 days"): the earliest QUALIFYING completion carries forward
      val inWindow = maxStepGapMicros
        .map(g => col("t2") > col("t") && col("t2") - col("t") <= g)
        .getOrElse(col("t2") > col("t"))
      stage = events.filter(col("event_type") === step)
        .select(col("user_id"), tus.as("t2"))
        .join(stage, "user_id")
        .filter(inWindow)
        .groupBy(col("user_id")).agg(min(col("t2")).as("t"))
      counts += stageCount(stage, i + 2, step)
    }
    counts.result().reduce(_ unionByName _).orderBy(col("stage"))
  }

  val WeekMicros: Long = 7L * 24 * 3600 * 1000 * 1000

  /** Cohort retention: users cohort by the period of their FIRST
    * event, and each (cohort, period_offset) cell counts the distinct
    * users active that many periods later — the classic retention
    * triangle. Period ids are INTEGER division of epoch-micros (both
    * engines compute `div` exactly; a floating floor() could flip at
    * an exact period boundary).
    *
    * Scale shape: first-event minima and the join back co-partition
    * on the user id (two stages, one key); the distinct collapses
    * (user, cohort, offset) before the final cell count, whose state
    * is one row per triangle cell.
    */
  def retentionCohorts(events: DataFrame,
      periodMicros: Long = WeekMicros): DataFrame = {
    require(periodMicros > 0, s"period must be positive: $periodMicros")
    val pu = events.select(col("user_id"),
      expr(s"(ts div 1000) div $periodMicros").as("p"))
    val firsts = pu.groupBy(col("user_id")).agg(min(col("p")).as("p0"))
    pu.join(firsts, "user_id")
      .select(col("user_id"), col("p0").as("cohort"),
        (col("p") - col("p0")).as("period_offset"))
      .distinct()
      .groupBy(col("cohort"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("period_offset"))
  }

  def customerBalanceRanks(customer: DataFrame): DataFrame = {
    val byBal = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val full = byBal.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    customer.select(
      col("c_custkey"), col("c_nationkey"),
      ntile(4).over(byBal).as("balance_quartile"),
      first_value(col("c_custkey")).over(full).as("richest_in_nation"),
      last_value(col("c_custkey")).over(full).as("poorest_in_nation"))
      .orderBy(col("c_custkey"))
  }

  /** As-of join: each left row picks up the value of the LATEST right
    * row with the same key and order-key ≤ the left row's — the
    * operator Spark lacks natively (SURVEY §7.4's compose-first
    * ladder, tier (a)).
    *
    * Built as union + running last_value instead of a range join:
    * a `l.ts >= r.ts` theta-join explodes to O(|L|·|R|) per key
    * before taking the max, while this is ONE shuffle on the key and
    * a within-partition streaming window — the only formulation that
    * survives 100 TB event tables. Ties are engine-stable: a right
    * row at exactly the left row's order-key qualifies (sorts before
    * it via the side marker), and among equal order-keys the largest
    * value wins.
    *
    * Right rows are padded with nulls for left-only columns; the
    * output keeps every left row (+ `outCol`, null when no right row
    * precedes it).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      orderCol: String, valueCol: String, outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val vType = right.schema(valueCol).dataType
    // the carried value rides inside a struct so that a RIGHT row whose
    // value is itself null still registers as "a match happened" —
    // last(ignoreNulls) skips only the left-marker nulls, never a
    // genuine null value from the latest qualifying right row
    val mType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", vType)))
    val l = left
      .withColumn("__is_left", lit(1))
      .withColumn("__m", lit(null).cast(mType))
      .select(leftCols.map(col) :+ col("__is_left") :+ col("__m"): _*)
    val rBase = right
      // a null order-key can never satisfy `r.ord <= l.ord` (the
      // comparison is NULL) — unfiltered it would sort nulls-first and
      // become a phantom "earliest" match for every left row
      .filter(col(orderCol).isNotNull)
      .select(col(keyCol), col(orderCol),
        lit(0).as("__is_left"), struct(col(valueCol).as("v")).as("__m"))
    val r = leftCols.foldLeft(rBase)((df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(leftCols.map(col) :+ col("__is_left") :+ col("__m"): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col("__is_left"), col("__m.v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(outCol, last(col("__m"), ignoreNulls = true).over(w)("v"))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__m")
  }

  /** Bounded range join: for each left row, COUNT the right rows of
    * the same key with order-key in (left − window, left]. A raw
    * `l.ts BETWEEN r.ts AND r.ts + w` theta join degenerates to a
    * per-key cross product before filtering; bucketing both sides to
    * `window`-sized cells and probing only the two cells that can
    * contain qualifying rows bounds the fan-out to 2× the per-cell
    * row count — the formulation that survives dense 100 TB event
    * streams. Zero-match left rows are kept (count 0).
    */
  def windowedCountJoin(left: DataFrame, right: DataFrame, keyCol: String,
      orderCol: String, windowSpan: Long, outCol: String,
      leftRowsDistinct: Boolean = false): DataFrame = {
    val cell = call_function("div", col(orderCol), lit(windowSpan))
    // when the CALLER guarantees left rows are distinct (e.g. they
    // carry a primary key), the count can be grouped directly on the
    // full left row — one aggregation shuffle instead of the
    // distinct + join-back pair below, still deterministic under
    // retries/AQE because the grouping key is real data, not a
    // synthetic id. Duplicate left rows would collapse; hence opt-in.
    if (leftRowsDistinct) {
      val leftCols = left.columns.toSeq
      val probed = left.withColumn("__probe", explode(array(cell, cell - 1)))
      val r = right.select(
        col(keyCol).as("__rk"),
        col(orderCol).as("__rord"),
        call_function("div", col(orderCol), lit(windowSpan)).as("__rcell"))
      return probed
        .join(r,
          col(keyCol) === col("__rk") && col("__probe") === col("__rcell") &&
          col("__rord") > col(orderCol) - windowSpan &&
          col("__rord") <= col(orderCol),
          "left_outer")
        .groupBy(leftCols.map(col): _*)
        .agg(count(col("__rord")).as(outCol))
    }
    // the match count is a function of (key, order) alone: count once
    // per DISTINCT pair, then join the counts back. Duplicate left
    // rows each keep their own output row (the join-back fans out),
    // probe cells explode once per distinct pair instead of once per
    // row, and — unlike a synthetic id() handle — nothing here is
    // nondeterministic under task retries or AQE re-plans.
    val pairs = left.select(col(keyCol), col(orderCol)).distinct()
    val probes = pairs.withColumn("__probe", explode(array(cell, cell - 1)))
    val r = right.select(
      col(keyCol).as("__rk"),
      col(orderCol).as("__rord"),
      call_function("div", col(orderCol), lit(windowSpan)).as("__rcell"))
    val counted = probes
      .join(r,
        col(keyCol) === col("__rk") && col("__probe") === col("__rcell") &&
        col("__rord") > col(orderCol) - windowSpan &&
        col("__rord") <= col(orderCol),
        "left_outer")
      .groupBy(col(keyCol), col(orderCol))
      // each pair appears once per probe cell; count(__rord) skips
      // the unmatched probes' nulls, summing true matches across both
      .agg(count(col("__rord")).as(outCol))
      .withColumnRenamed(keyCol, "__ck")
      .withColumnRenamed(orderCol, "__cord")
    // null-safe equality so left rows with a null key/order still get
    // their (zero) count back instead of dropping to a null outCol
    left.join(counted,
        col(keyCol) <=> col("__ck") && col(orderCol) <=> col("__cord"), "left")
      .drop("__ck", "__cord")
      .withColumn(outCol, coalesce(col(outCol), lit(0L)))
  }

  /** Hierarchical rollup (region → nation subtotals + grand total)
    * via ROLLUP grouping sets.
    */
  def regionNationRollup(customer: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_balance"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** Event-type transition matrix — the first-order Markov readout of
    * a clickstream: for each ordered per-user event pair, count
    * (from → to) transitions and row-normalize into transition
    * probabilities ("after a view, 32% click"). Ties in time break on
    * event_id, so the sequence is total and engine-identical.
    *
    * Scale shape: one shuffle on user_id for the lead() window (the
    * sessionization shape), then an aggregation whose state is
    * bounded by |event types|² — tiny regardless of corpus size. The
    * probability divides exact longs, so the 4-place round is
    * engine-stable.
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    counts
      .withColumn("p", round(col("n") / sum(col("n")).over(byFrom), 4))
      .orderBy(col("from_type"), col("to_type"))
  }
}
