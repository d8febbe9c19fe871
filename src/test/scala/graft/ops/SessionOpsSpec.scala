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

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (10L, 1L, 100L),  // after rights at 50,100 → equal-ts right qualifies
      (11L, 1L, 60L),   // only the right at 50 precedes
      (12L, 1L, 10L),   // nothing precedes → null
      (13L, 2L, 500L)   // other key, matches its own stream only
    ).toDF("event_id", "user_id", "tus")
    val right = Seq(
      (1L, 50L, 101L),
      (1L, 100L, 102L), // equal ts as left event 10
      (1L, 100L, 103L), // tie at same ts → larger value wins
      (2L, 400L, 201L)
    ).toDF("user_id", "tus", "event_id")
    val out = SessionOps.asofJoin(left, right, "user_id", "tus",
      "event_id", "matched")
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(out(10L) === Some(103L)) // equal-ts qualifies, tie → max id
    assert(out(11L) === Some(101L))
    assert(out(12L) === None)
    assert(out(13L) === Some(201L))
  }

  test("asofJoin: null right order-keys never match (no phantom earliest row)") {
    val left = Seq((30L, 1L, 10L)).toDF("event_id", "user_id", "tus")
    val right = Seq(
      (1L, Option.empty[Long], 901L), // null ts: can't satisfy <=
      (1L, Some(500L), 902L)          // later than the left row
    ).toDF("user_id", "tus", "event_id")
    val out = SessionOps.asofJoin(left, right, "user_id", "tus",
      "event_id", "matched").collect()
    assert(out.length === 1 && out(0).isNullAt(3), out(0).toString)
  }

  test("asofJoin: a latest right row with NULL value yields null, not a stale match") {
    val left = Seq((20L, 1L, 100L)).toDF("event_id", "user_id", "tus")
    val right = Seq(
      (1L, Some(50L), Some(7L)),
      (1L, Some(60L), None) // latest qualifying row carries a null value
    ).toDF("user_id", "tus", "payload")
    val out = SessionOps.asofJoin(left, right, "user_id", "tus",
      "payload", "matched").collect()
    assert(out.length === 1)
    assert(out(0).isNullAt(3), out(0).toString) // null, NOT the stale 7
  }

  test("asofJoin keeps every left row exactly once") {
    val ev = Tables.events(spark, sfDir).withColumn("tus", expr("ts div 1000"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tus")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"tus", $"event_id")
    val joined = SessionOps.asofJoin(purchases, views, "user_id", "tus",
      "event_id", "view_event")
    assert(joined.count() === purchases.count())
    assert(joined.select("event_id").distinct().count() === purchases.count())
  }

  test("windowedCountJoin ≡ naive theta-join count (incl. zero matches)") {
    val ev = Tables.events(spark, sfDir).withColumn("tus", expr("ts div 1000"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"tus")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"tus".as("v_tus"))
    val w = 600000000L
    val bucketed = SessionOps.windowedCountJoin(purchases,
      views.select($"v_user".as("user_id"), $"v_tus".as("tus")),
      "user_id", "tus", w, "n")
      .select($"event_id", $"n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = purchases
      .join(views, $"user_id" === $"v_user" &&
        $"v_tus" > $"tus" - w && $"v_tus" <= $"tus", "left_outer")
      .groupBy($"event_id").agg(count($"v_tus").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed === naive)
    // the no-join-back path (left rows distinct by PK) must agree
    val direct = SessionOps.windowedCountJoin(purchases,
      views.select($"v_user".as("user_id"), $"v_tus".as("tus")),
      "user_id", "tus", w, "n", leftRowsDistinct = true)
      .select($"event_id", $"n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct === naive)
    assert(bucketed.values.exists(_ === 0L) || bucketed.nonEmpty)
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

  test("funnel: strictly-after chaining, not per-type minima") {
    val events = Seq(
      // user 1: full view→click→purchase conversion
      (1L, 1L, ns(10), "view", 0.0),
      (2L, 1L, ns(20), "click", 0.0),
      (3L, 1L, ns(30), "purchase", 0.0),
      // user 2: only click is BEFORE its first view → stalls at stage 1
      (4L, 2L, ns(5), "click", 0.0),
      (5L, 2L, ns(10), "view", 0.0),
      // user 3: view then click, never purchases → stage 2
      (6L, 3L, ns(10), "view", 0.0),
      (7L, 3L, ns(20), "click", 0.0),
      (8L, 3L, ns(5), "purchase", 0.0), // purchase before the click: no convert
      // user 4: purchase only — never enters the funnel
      (9L, 4L, ns(5), "purchase", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = SessionOps.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("windowed funnel: a slow conversion falls outside the gap bound") {
    val events = Seq(
      // user 1 converts quickly: view→click in 10 min
      (1L, 1L, ns(0), "view", 0.0),
      (2L, 1L, ns(10), "click", 0.0),
      // user 2 clicks 40 min after the view — outside a 30-min window,
      // but a later click at 50 min is ALSO out (window anchors at the
      // view, not at any click)
      (3L, 2L, ns(0), "view", 0.0),
      (4L, 2L, ns(40), "click", 0.0),
      (5L, 2L, ns(50), "click", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val bounded = SessionOps.funnel(events, Seq("view", "click"),
      maxStepGapMicros = Some(30L * 60 * 1000000L))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(bounded === Map("view" -> 2L, "click" -> 1L))
    // unbounded, user 2's 40-min click converts
    val open = SessionOps.funnel(events, Seq("view", "click"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(open === Map("view" -> 2L, "click" -> 2L))
  }

  test("retention cohorts: hand triangle; offset-0 row covers the cohort") {
    def wk(w: Long, m: Long) = 1700000000000000000L +
      w * SessionOps.WeekMicros * 1000L + m * 60L * 1000000000L
    val events = Seq(
      // user 1: first week 0, returns weeks 1 and 3 (twice in week 1)
      (1L, 1L, wk(0, 5), "view", 0.0),
      (2L, 1L, wk(1, 0), "view", 0.0),
      (3L, 1L, wk(1, 9), "click", 0.0),
      (4L, 1L, wk(3, 2), "view", 0.0),
      // user 2: first week 1 only
      (5L, 2L, wk(1, 1), "view", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val cohortBase = 1700000000000000000L / 1000 / SessionOps.WeekMicros
    val out = SessionOps.retentionCohorts(events)
      .collect()
      .map(r => (r.getLong(0) - cohortBase, r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out === Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
  }

  test("retention on the corpus: triangle invariants hold") {
    val events = Tables.events(spark, sfDir)
    val out = SessionOps.retentionCohorts(events).collect()
    // every user appears in exactly one cohort at offset 0
    val atZero = out.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(atZero === events.select("user_id").distinct().count())
    // no cell exceeds its cohort's offset-0 population
    val base = out.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.foreach(r => assert(r.getLong(2) <= base(r.getLong(0))))
  }

  test("funnel on the corpus: stage populations never grow") {
    val out = SessionOps.funnel(Tables.events(spark, sfDir),
      Seq("view", "click", "purchase"))
      .collect().map(_.getLong(2))
    assert(out.length === 3)
    assert(out.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("event transitions count ordered per-user pairs, probs sum to 1") {
    // user 1: view→click→view; user 2: view→purchase; user 3: lone
    // event (no transition). Transitions: view→click, click→view,
    // view→purchase.
    val ev = Seq(
      (1L, 1L, 1L, "view"), (2L, 2L, 1L, "click"), (3L, 3L, 1L, "view"),
      (4L, 1L, 2L, "view"), (5L, 2L, 2L, "purchase"),
      (6L, 1L, 3L, "view")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = SessionOps.eventTransitions(ev)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toList
    assert(out === List(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "purchase", 1L, 0.5)))
    // per-from probabilities always sum to 1 on the real corpus
    val sums = SessionOps.eventTransitions(Tables.events(spark, sfDir))
      .groupBy("from_type").sum("p")
      .collect().map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 0.01))
  }
}
