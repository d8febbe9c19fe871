package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.quality.RuleBasedScorer
import graft.ops.{RelationalOps, StatsOps}

/** Invariant checks over generated inputs (SURVEY §5: weight bounds,
  * pagination completeness, CDC op totality, HLL error envelope).
  * Inputs come from ScalaCheck generators with a fixed seed, then one
  * Spark evaluation asserts the invariant over every sample.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  private val textGen: Gen[String] = for {
    words <- Gen.listOfN(30, Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)), Gen.oneOf("the", "a", "of", "le", "der"),
      Gen.const("123-45-6789"), Gen.const("x@y.com")))
  } yield words.filter(_.nonEmpty).mkString(" ")

  test("quality scores bounded and formula-consistent for arbitrary text") {
    val df = samples(textGen, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = RuleBasedScorer.score(df, "text").collect()
    rows.foreach { r =>
      val (c, k, p, l) = (r.getAs[Long]("completeness"), r.getAs[Long]("consistency"),
        r.getAs[Long]("pii_detection"), r.getAs[Long]("language_quality"))
      Seq(c, k, p, l).foreach(v => assert(v >= 0 && v <= 100))
      val overall = r.getAs[Double]("quality_score")
      assert(overall === (c * 3 + k * 3 + p * 2 + l * 2) / 10.0)
      assert(r.getAs[Boolean]("quality_is_valid") === (overall >= 50.0))
      assert(r.getAs[Boolean]("has_pii") === (p === 0L))
    }
  }

  test("pagination is a partition: pages concatenate to the prefix, disjoint") {
    val orders = Tables.orders(spark, sfDir)
    val pageSize = 17 // deliberately not dividing anything evenly
    val pages = (0 until 5).map(i =>
      RelationalOps.listPage(orders, i * pageSize, pageSize)
        .collect().map(_.getLong(0)).toSeq)
    val all = RelationalOps.listPage(orders, 0, 5 * pageSize)
      .collect().map(_.getLong(0)).toSeq
    assert(pages.flatten === all)
    assert(pages.flatten.distinct.size === pages.flatten.size)
  }

  test("components: star ≡ min-label ≡ union-find on random graphs") {
    // three independent algorithms must agree exactly on arbitrary
    // edge lists — sparse (forests + chains) and dense (many
    // triangles) regimes both covered
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 60L)
      b <- Gen.chooseNum(0L, 60L)
    } yield (a, b)
    for ((n, seedOffset) <- Seq((30, 0), (120, 1))) {
      val edges = Gen.listOfN(n, edgeGen)
        .apply(Gen.Parameters.default, Seed(42L + seedOffset)).get
        .toDF("a", "b")
      val fast = Dedup.connectedComponents(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val minlabel = Dedup.connectedComponents(edges, "a", "b",
        maxIter = 70, smallGraphEdges = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = Dedup.connectedComponents(edges, "a", "b",
        smallGraphEdges = 0L, algorithm = "star")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(minlabel === fast, s"minlabel vs union-find, n=$n")
      assert(star === fast, s"star vs union-find, n=$n")
    }
  }

  test("CDC synthetic op assignment is total and filter is its complement") {
    val ids = samples(Gen.chooseNum(0L, 100000L), 300).distinct
    val df = ids.map(i => (i, "t", "en", "s", 1L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val decoded = graft.cdc.Cdc.decode(graft.cdc.Cdc.syntheticEnvelopes(df))
    val ops = decoded.select($"env.op").as[String].collect()
    assert(ops.forall(Set("c", "u", "r", "d").contains))
    val kept = graft.cdc.Cdc.pipeline(graft.cdc.Cdc.syntheticEnvelopes(df)).count()
    val expected = ids.count(i => i % 20 != 0 && i % 20 != 1)
    assert(kept === expected)
  }

  test("asofJoin matches a per-row Scala reference on random keyed streams") {
    val rowGen = for {
      key <- Gen.choose(1L, 5L)
      ts <- Gen.choose(0L, 40L)
    } yield (key, ts)
    val lefts = samples(rowGen, 120).zipWithIndex
      .map { case ((k, t), i) => (1000L + i, k, t) }
    val rights = samples(rowGen, 150).zipWithIndex
      .map { case ((k, t), i) => (k, t, 2000L + i) }
    val out = graft.ops.SessionOps.asofJoin(
      lefts.toDF("left_id", "key", "ts"),
      rights.toDF("key", "ts", "val"),
      "key", "ts", "val", "matched")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    // reference: latest right at-or-before; ties broken by max value
    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (lid, k, t) =>
      val expected = byKey.getOrElse(k, Nil)
        .filter(_._2 <= t)
        .sortBy(r => (r._2, r._3))
        .lastOption.map(_._3)
      assert(out(lid) === expected, s"left $lid key=$k ts=$t")
    }
  }

  test("windowedCountJoin matches a per-row Scala reference on random streams") {
    val rowGen = for {
      key <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 200L)
    } yield (key, ts)
    val lefts = samples(rowGen, 100).zipWithIndex
      .map { case ((k, t), i) => (3000L + i, k, t) }
    val rights = samples(rowGen, 200)
    val span = 25L
    val out = graft.ops.SessionOps.windowedCountJoin(
      lefts.toDF("left_id", "key", "ts"),
      rights.toDF("key", "ts"),
      "key", "ts", span, "n")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (lid, k, t) =>
      val expected = byKey.getOrElse(k, Nil)
        .count(r => r._2 > t - span && r._2 <= t)
      assert(out(lid) === expected.toLong, s"left $lid key=$k ts=$t")
    }
  }

  test("uuid7 ordering follows timestamp ordering") {
    val ts = samples(Gen.chooseNum(1L, 1L << 40), 100).distinct.sorted
    val df = ts.map(t => (t, s"k$t")).toDF("ts", "k")
    val ids = df.orderBy($"ts").select(TextFunctions.uuid7($"ts", $"k"))
      .collect().map(_.getString(0))
    assert(ids.sorted.toSeq === ids.toSeq)
  }

  test("HLL sketch merge ≡ single sketch (PFMERGE associativity)") {
    val events = Tables.events(spark, sfDir)
    val merged = StatsOps.viewStatsSketched(events)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = events.filter($"event_type" === "view")
      .select(StatsOps.docKey($"props").as("doc_id"), $"user_id")
      .groupBy($"doc_id")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // and the estimate tracks the exact count within HLL error
    val exact = StatsOps.viewStats(events)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    merged.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)).toDouble / math.max(exact(k), 1) < 0.1)
    }
  }
}
