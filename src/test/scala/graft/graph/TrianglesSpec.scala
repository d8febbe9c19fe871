package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  // K4 on 1-4 (4 triangles), path 5-6-7 (none), star 8→{9,10,11}
  // (none), triangle 12-13-14 with pendant 15, plus noise: duplicate,
  // reversed-duplicate, and self-loop edges that must all collapse
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (5L, 6L), (6L, 7L),
    (8L, 9L), (8L, 10L), (8L, 11L),
    (12L, 13L), (13L, 14L), (12L, 14L), (14L, 15L),
    (2L, 1L), (1L, 2L), (9L, 8L), (12L, 12L))

  private def df = edges.toDF("s", "t")

  private lazy val adj: Map[Long, Set[Long]] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    und.groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
  }

  test("per-node stats match a brute-force reference") {
    val got = Triangles.triangleStats(df, "s", "t").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === adj.keySet)
    adj.foreach { case (v, ns) =>
      val d = ns.size.toLong
      val t = ns.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }.toLong
      val c = if (d >= 2)
        ((2 * t * 20000 + d * (d - 1)) / (2 * d * (d - 1))) / 10000.0
      else 0.0
      assert(got(v) === ((d, t, c)), s"node $v")
    }
    // spot values: K4 members touch 3 triangles at clustering 1.0,
    // the pendant and star leaves touch none
    assert(got(1L) === ((3L, 3L, 1.0)))
    assert(got(8L) === ((3L, 0L, 0.0)))
    assert(got(15L) === ((1L, 0L, 0.0)))
    assert(got(12L) === ((2L, 1L, 1.0)))
  }

  test("global count: 4 from K4 plus 1 planted") {
    val n = Triangles.triangleCount(df, "s", "t").head().getLong(0)
    assert(n === 5L)
  }

  test("assortativity matches a local Pearson reference; star is -1, cycle null") {
    def ref(es: Seq[(Long, Long)]): Option[Double] = {
      val und = es.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      val deg = und.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val pts = und.flatMap(e => Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
      val m = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val vx = m * sxx - sx * sx; val vy = m * syy - sy * sy
      if (vx > 0 && vy > 0)
        Some(BigDecimal((m * sxy - sx * sy).toDouble /
            math.sqrt(vx.toDouble * vy.toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
    }
    def got(es: Seq[(Long, Long)]): (Long, Option[Double]) = {
      val r = Triangles.assortativity(es.toDF("s", "t"), "s", "t").head()
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    val mixed = got(edges)
    assert(mixed._2 === ref(edges))
    // a perfect star is maximally disassortative
    val star = (2L to 8L).map(i => (1L, i))
    assert(got(star) === ((7L, Some(-1.0))))
    // a cycle has zero degree variance → NULL, not NaN
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(got(cycle) === ((4L, None)))
  }

  test("fast ≡ distributed: fixture and random graphs") {
    def canon(r: org.apache.spark.sql.DataFrame) = r.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(canon(Triangles.triangleStats(df, "s", "t")) ===
      canon(Triangles.triangleStats(df, "s", "t", smallGraphEdges = 0L)))
    Seq(1, 7, 42).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val es = Seq.fill(300)(
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("s", "t")
      assert(canon(Triangles.triangleStats(es, "s", "t")) ===
        canon(Triangles.triangleStats(es, "s", "t", smallGraphEdges = 0L)),
        s"seed $seed")
    }
  }

  test("non-Long ids take the distributed path and still answer") {
    val es = Seq((1, 2), (2, 3), (1, 3), (3, 4)).toDF("s", "t")
    val got = Triangles.triangleStats(es, "s", "t").collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 1L, 2 -> 1L, 3 -> 1L, 4 -> 0L))
  }

  test("plan: hash joins only, no cartesian or nested-loop") {
    val p = Triangles.triangleStats(df, "s", "t")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
