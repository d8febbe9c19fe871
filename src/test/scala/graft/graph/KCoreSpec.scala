package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
    (5L, 6L), (6L, 7L), (7L, 8L),                               // chain
    (9L, 10L), (9L, 11L), (9L, 12L),                            // star
    (13L, 14L), (14L, 15L), (13L, 15L), (15L, 16L),             // tri+pendant
    (4L, 5L),                                                    // K4→chain bridge
    (2L, 1L), (13L, 13L))                                        // noise

  private def df = edges.toDF("s", "t")

  /** Local synchronous peel: drop all sub-k nodes together, repeat. */
  private def refCore(k: Int): (Map[Long, Int], Int) = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    def degrees(alive: Set[Long]): Map[Long, Int] =
      und.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
    var alive = und.flatMap(e => Seq(e._1, e._2)).toSet
    var rounds = 0
    var done = false
    while (!done) {
      val next = degrees(alive).filter(_._2 >= k).keySet
      if (next == alive) done = true
      else { alive = next; rounds += 1; if (alive.isEmpty) done = true }
    }
    (degrees(alive), rounds)
  }

  test("2-core and 3-core match the synchronous-peel reference") {
    for (k <- Seq(2, 3)) {
      val r = KCore.kCore(df, "s", "t", k)
      val got = r.members.collect()
        .map(x => x.getLong(0) -> x.getLong(1).toInt).toMap
      val (want, wantRounds) = refCore(k)
      assert(got === want, s"k=$k members")
      assert(r.rounds === wantRounds, s"k=$k rounds")
    }
  }

  test("3-core keeps exactly K4; the planted triangle peels") {
    val got = KCore.kCore(df, "s", "t", 3).members.collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 4L))
  }

  test("k above the max degree empties the core in bounded rounds") {
    val r = KCore.kCore(df, "s", "t", 10)
    assert(r.members.collect().isEmpty)
  }

  test("an exhausted round budget fails loudly instead of returning a superset") {
    val e = intercept[IllegalStateException] {
      KCore.kCore(df, "s", "t", 2, maxRounds = 0)
    }
    assert(e.getMessage.contains("fixpoint"))
  }

  test("fast path matches the distributed rounds: members, degrees, " +
      "and round count") {
    for (k <- Seq(2, 3, 10)) {
      val fast = KCore.kCore(df, "s", "t", k)
      val dist = KCore.kCore(df, "s", "t", k, smallGraphEdges = 0L)
      val fm = fast.members.collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      val dm = dist.members.collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(fm === dm, s"k=$k members")
      assert(fast.rounds === dist.rounds, s"k=$k rounds")
    }
  }

  test("fast path declines when the byte budget can't hold the edges") {
    val fast = KCore.kCore(df, "s", "t", 2,
      fastPathByteBudget = KCore.FastPathBytesPerEdge) // room for 1 edge
    val dist = KCore.kCore(df, "s", "t", 2, smallGraphEdges = 0L)
    // both are the distributed path here — same result, and the
    // budget-declined call still peels correctly
    assert(fast.members.collect().map(_.getLong(0)).toSet ===
      dist.members.collect().map(_.getLong(0)).toSet)
    assert(fast.rounds === dist.rounds)
  }

  test("a budget of exactly the needed shrink rounds succeeds") {
    val (_, needed) = refCore(2)
    assert(needed > 0)
    val r = KCore.kCore(df, "s", "t", 2, maxRounds = needed)
    assert(r.rounds === needed)
    intercept[IllegalStateException] {
      KCore.kCore(df, "s", "t", 2, maxRounds = needed - 1)
    }
  }
}
