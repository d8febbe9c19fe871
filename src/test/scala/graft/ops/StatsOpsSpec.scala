package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class StatsOpsSpec extends SparkSpec {

  lazy val events = Tables.events(spark, sfDir)

  test("viewStats counts only view events, exact distinct users") {
    val rows = StatsOps.viewStats(events).collect()
    assert(rows.nonEmpty)
    val nViews = events.filter(col("event_type") === "view").count()
    assert(rows.map(_.getLong(1)).sum === nViews)
    // unique ≤ total per key
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
  }

  test("approx distinct within HLL error envelope of exact") {
    val exact = StatsOps.viewStats(events)
      .select(sum("unique_views")).collect()(0).getLong(0)
    val approx = StatsOps.viewStatsApprox(events)
      .select(sum("approx_unique_views")).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("percentiles are ordered and bounded by min/max") {
    val rows = StatsOps.valuePercentiles(Tables.events(spark, sfDir)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (vMin, vMax) = (r.getDouble(4), r.getDouble(5))
      assert(vMin <= p50 && p50 <= p90 && p90 <= p99 && p99 <= vMax,
        s"${r.getString(0)}: $vMin/$p50/$p90/$p99/$vMax out of order")
    }
  }

  test("eventTypeRollup partitions all events") {
    val rows = StatsOps.eventTypeRollup(events).collect()
    assert(rows.map(_.getLong(1)).sum === events.count())
  }

  test("sketch percentiles honor the RANK error bound") {
    // approx_percentile guarantees rank proximity, not value
    // proximity — in a heavy tail the nearest stored value to rank
    // p±ε can be far away in value. Assert the actual contract: the
    // fraction of values at or below each sketch output is within a
    // small rank tolerance of the target percentile.
    val ev = Tables.events(spark, sfDir)
    val approx = StatsOps.valuePercentilesApprox(ev).collect()
      .map(r => r.getString(0) ->
        Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2), 0.99 -> r.getDouble(3)))
    approx.foreach { case (t, ps) =>
      val vals = ev.filter(col("event_type") === t)
        .select("value").collect().map(_.getDouble(0)).sorted
      ps.foreach { case (target, sketched) =>
        val rank = vals.count(_ <= sketched).toDouble / vals.length
        assert(math.abs(rank - target) <= 0.02,
          s"$t p$target: sketch=$sketched sits at rank $rank")
      }
    }
  }

  test("trending decay halves a value per half-life of age") {
    import spark.implicits._
    // ts in epoch NANOS; half-life 1 hour. Newest event (the anchor)
    // contributes full value; one half-life older → half; two → quarter
    val h = 3600000000L // micros
    val ev = Seq(
      (1L, 2L * h * 1000L, 1L, "view", 8.0),
      (2L, 1L * h * 1000L, 1L, "view", 8.0),
      (3L, 0L, 1L, "view", 8.0),
      (4L, 2L * h * 1000L, 1L, "click", 2.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = StatsOps.trendingByType(ev, halfLifeUs = h)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("view") === ((3L, 8.0 + 4.0 + 2.0)))
    assert(out("click") === ((1L, 2.0)))
    // monotone: shrinking the half-life never raises a type's score
    val fast = StatsOps.trendingByType(ev, halfLifeUs = h / 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(fast("view") < out("view")._2)
  }
}
