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
}
