package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference of the exact synchronous recurrence: own-id
    * init, per-round most-frequent-neighbor-label with ties to the
    * smallest, all nodes together, min-member canonical relabel.
    */
  private def refLpa(edges: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = und.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2) }
    var label = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      label = adj.map { case (u, ns) =>
        val votes = ns.map(label).groupBy(identity)
          .map { case (l, xs) => l -> xs.size }
        val mx = votes.values.max
        u -> votes.collect { case (l, c) if c == mx => l }.min
      }
    }
    val minOf = label.toSeq.groupBy(_._2)
      .map { case (l, xs) => l -> xs.map(_._1).min }
    label.map { case (n, l) => n -> minOf(l) }
  }

  private val edges = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L),                 // triangle
    (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L),       // triangle + pendant
    (3L, 4L),                                      // bridge
    (8L, 9L),                                      // isolated pair
    (2L, 1L), (8L, 8L))                            // noise

  test("fast path matches the local synchronous reference") {
    for (r <- Seq(1, 2, 4)) {
      val got = Communities.labelPropagation(edges.toDF("s", "t"),
        "s", "t", rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got === refLpa(edges, r), s"rounds=$r")
    }
  }

  test("distributed rounds match the fast path label-for-label") {
    val rnd = new scala.util.Random(42)
    val es = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    for (r <- Seq(1, 3)) {
      val fast = Communities.labelPropagation(es.toDF("s", "t"),
        "s", "t", rounds = r)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val dist = Communities.labelPropagation(es.toDF("s", "t"),
        "s", "t", rounds = r, smallGraphEdges = 0L)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(dist === fast, s"rounds=$r")
      assert(fast === refLpa(es, r), s"rounds=$r vs reference")
    }
  }

  test("a clean two-community split canonicalizes to min member ids") {
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L))
    val got = Communities.labelPropagation(es.toDF("s", "t"), "s", "t",
      rounds = 4).collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("modularity: exact rational on a hand example") {
    // two triangles + one bridge, perfect 2-split:
    // m=7, each community: e_c=3 intra, D_c = 7 (3 nodes: 2+2+3)
    // num = sum(4*7*3 - 49) * 2 = (84-49)*2 = 70; den = 4*49 = 196
    // Q = 70/196 = 0.357142... -> 0.3571
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "community")
    val r = Communities.modularity(es.toDF("s", "t"), labels, "s", "t")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((6L, 7L, 2L)))
    assert((r.getLong(3), r.getLong(4)) === ((70L, 196L)))
    assert(r.getDouble(5) === 0.3571)
  }

  test("modularity of the all-in-one partition is negative-exact") {
    // one community holding everything: Q = e/m - 1 = 0 - ... wait:
    // e_c = m, D_c = 2m -> num = 4m*m - 4m^2 = 0 -> Q = 0
    val es = Seq((1L, 2L), (2L, 3L))
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "community")
    val r = Communities.modularity(es.toDF("s", "t"), labels, "s", "t")
      .collect()(0)
    assert(r.getLong(3) === 0L)
    assert(r.getDouble(5) === 0.0)
  }

  test("the modularity readout is exact past the Long-overflow edge " +
      "count (~7.6M edges)") {
    // m = 5e7 edges -> q_den = 4m^2 = 1e16; the old Long form
    // ((q_num + q_den) * 20000 + q_den) needed ~2.5e20
    val den = 4L * 50000000L * 50000000L
    val cases = Seq(den / 4, 3333333333333333L, -den / 2, 0L)
    val df = cases.map(n => (n, den)).toDF("q_num", "q_den")
    val got = df.select(col("q_num"),
      Communities.modularityReadout.as("modularity"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def ref(num: Long): Double = {
      val q = ((BigInt(num) + den) * 20000 + den) / (BigInt(den) * 2)
      q.toLong / 10000.0 - 1.0
    }
    cases.foreach(n => assert(got(n) === ref(n), s"q_num=$n"))
    assert(got(den / 4) === 0.25)
  }

  test("communitySizes histograms the partition") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L), (20L, 20L)).toDF("node", "community")
    val got = Communities.communitySizes(labels).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("assignToCommunities: majority vote, smallest-label ties, " +
      "own-id fallback, edge noise collapses") {
    val frozen = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "community")
    // 100: two labeled nbrs in c1, one in c10 → majority 1
    // 101: one nbr in c1, one in c10 → tie → smallest (1)
    // 102: only an unlabeled nbr (999) → own id
    // 103: no edges at all → own id
    // noise: duplicate, reversed-duplicate, self-loop, null endpoints
    val edges = Seq(
      (100L, 1L), (100L, 2L), (100L, 10L),
      (101L, 3L), (101L, 11L),
      (102L, 999L),
      (1L, 100L), (100L, 1L), (100L, 100L))
      .toDF("s", "t")
      .unionByName(Seq((Option.empty[Long], Option(1L)))
        .toDF("s", "t"))
    val nodes = Seq(100L, 101L, 102L, 103L).toDF("node")
    val got = Communities.assignToCommunities(nodes, edges, "s", "t", frozen)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(100L -> 1L, 101L -> 1L, 102L -> 102L, 103L -> 103L))
  }

  test("assignFromStaged ≡ assignToCommunities; the vote join plans " +
      "zero exchanges and never re-canonicalizes") {
    val frozen = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "community")
    val edges = Seq(
      (100L, 1L), (100L, 2L), (100L, 10L),
      (101L, 3L), (101L, 11L),
      (102L, 999L),
      (1L, 100L), (100L, 1L), (100L, 100L))
      .toDF("s", "t")
      .unionByName(Seq((Option.empty[Long], Option(1L))).toDF("s", "t"))
    val nodes = Seq(100L, 101L, 102L, 103L).toDF("node")
    try {
      Communities.stageAssignmentEdges(edges, "s", "t", "t_lpa_edges", 4)
      Communities.writeCommunityLabelsBucketed(frozen, "t_lpa_labels", 4)
      val served = Communities.assignFromStaged(nodes,
        "t_lpa_edges", "t_lpa_labels")
      val want = Communities
        .assignToCommunities(nodes, edges, "s", "t", frozen)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(served.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        === want)
      // plan shape: the co-bucketed label join is exchange-free —
      // walk the executed plan down from the first join and assert
      // no Exchange below it (the BucketedTablesSpec contract
      // applied to the serving query); the aggregations and the
      // final probe join above it may exchange, the staged sides
      // must not
      // walk through AQE wrappers: collect() stops at stage
      // boundaries, so unwrap AdaptiveSparkPlanExec/QueryStageExec
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def allNodes(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        p +: kids.flatMap(allNodes)
      }
      val ex = served.queryExecution.executedPlan
      val voteJoin = allNodes(ex).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.Inner => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.Inner => j
      }
      assert(voteJoin.nonEmpty, ex.toString)
      voteJoin.foreach { j =>
        assert(!allNodes(j).tail.exists(
          _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
          j.toString)
      }
      // and the serving plan has no canonicalization pass: zero
      // least/greatest and no scan of the raw edge input
      val p = ex.toString
      assert(!p.contains("least("), p)
      assert(!p.contains("greatest("), p)
    } finally {
      spark.sql("DROP TABLE IF EXISTS t_lpa_edges")
      spark.sql("DROP TABLE IF EXISTS t_lpa_labels")
    }
  }

  test("modularity survives an empty graph with a NULL readout") {
    val es = Seq.empty[(Long, Long)]
    val labels = Seq.empty[(Long, Long)].toDF("node", "community")
    val r = Communities.modularity(es.toDF("s", "t"), labels, "s", "t")
      .collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 0L)
    assert(r.isNullAt(5))
  }
}
