package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class SessionOpsSpec extends SparkSpec {
  import spark.implicits._

  // handcrafted stream: user 1 has two sessions (40-min gap),
  // user 2 one session; ts in epoch NANOS (as the nanosAsLong read)
  private def ns(min: Long) = 1700000000000000000L + min * 60L * 1000000000L
  lazy val fixture = Seq(
    (1L, 1L, ns(0), "view", 1.0),
    (2L, 1L, ns(10), "click", 2.0),
    (3L, 1L, ns(50), "view", 3.0),  // 40-min gap → new session
    (4L, 1L, ns(55), "purchase", 4.0),
    (5L, 2L, ns(0), "view", 5.0)
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("session boundaries split on gaps > threshold") {
    val stats = SessionOps.sessionStats(fixture).collect()
    val u1 = stats.filter(_.getLong(0) == 1L)
    assert(u1.length === 2)
    assert(u1(0).getAs[Long]("n_events") === 2) // events 1,2
    assert(u1(1).getAs[Long]("n_events") === 2) // events 3,4
    assert(u1(0).getAs[Long]("duration_ms") === 10 * 60 * 1000L)
    assert(stats.filter(_.getLong(0) == 2L).head.getAs[Long]("n_events") === 1)
  }

  test("sessions partition all events exactly once") {
    val events = Tables.events(spark, sfDir)
    val total = SessionOps.sessionStats(events)
      .agg(sum("n_events")).head.getLong(0)
    assert(total === events.count())
  }

  test("running totals are monotone per user; gaps null only at session heads") {
    val r = SessionOps.runningUserTotals(fixture).collect()
    val u1 = r.filter(_.getLong(0) == 1L).sortBy(_.getAs[Int]("event_seq"))
    val running = u1.map(_.getAs[Double]("running_value"))
    assert(running.toSeq === running.sorted.toSeq)
    assert(u1.head.isNullAt(u1.head.fieldIndex("gap_ms"))) // first event: no lag
    assert(u1.tail.forall(!_.isNullAt(u1.head.fieldIndex("gap_ms"))))
  }

  test("rollup emits detail, subtotal, and grand-total rows") {
    val roll = SessionOps.regionNationRollup(
      Tables.customer(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir)).collect()
    val grand = roll.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val nCust = Tables.customer(spark, sfDir).count()
    assert(grand.head.getAs[Long]("n_customers") === nCust)
    // region subtotals sum to the grand total
    val regionRows = roll.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(regionRows.map(_.getAs[Long]("n_customers")).sum === nCust)
  }
}
