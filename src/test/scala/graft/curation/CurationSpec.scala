package graft.curation

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark =
    Seq((900L, "alpha beta gamma delta", "bench")).toDF("doc_id", "text", "source")

  // one offender per gate, one duplicate pair, one clean survivor
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "src0"),
    (2L, "the quick brown fox jumps over the lazy dog", "src0"), // exact dup
    (3L, ("a b " * 12).trim, "src0"),                            // repetitive
    (4L, "alpha beta gamma delta", "src0")                       // contaminated
  ).toDF("doc_id", "text", "source")

  test("each gate drops its offender; dedup keeps the min id") {
    val out = Curation.curate(corpus, benchmark).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getAs[String]("source") === "src0")
    assert(out.head.getAs[Double]("lm_nll") > 0.0)
  }

  test("the LM gate binds: a tiny threshold rejects every scoring doc") {
    // every corpus doc has at least one bigram, so every lm_nll > 0
    assert(Curation.curate(corpus, benchmark, nllThreshold = 1e-4).count() === 0)
  }

  test("curate() auto-releases the token cache after the first action") {
    // the convenience form's lifecycle contract (ADVICE r5): the
    // internally persisted token artifact must be gone once the first
    // action over the returned frame completes — no per-call cache
    // accumulation in long-lived sessions. The release listener runs
    // on the async ExecutionListenerBus, so poll briefly.
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    assert(Curation.curate(corpus, benchmark).count() === 1)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(leaked.isEmpty, s"curate() left persisted RDDs: $leaked")
  }

  test("observed curation reports per-gate drops with no extra action") {
    val (out, obs) = Curation.curateObserved(corpus, benchmark)
    assert(out.count() === 1) // the one action both executes and observes
    val m = obs.get
    assert(m("docs_in") === 4L)
    assert(m("dropped_repetitive") === 1L)   // doc 3
    assert(m("dropped_contaminated") === 1L) // doc 4
    assert(m("dropped_unusual") === 0L)
  }

  test("curationReport: per-source gate counts and cross-source dedup kept") {
    // src1's copy of doc 1's text loses the dedup to src0's doc 1
    // (min id), so src1 shows n_passed=1 but n_kept=0
    val multi = corpus.unionByName(Seq(
      (10L, "the quick brown fox jumps over the lazy dog", "src1")
    ).toDF("doc_id", "text", "source"))
    val rows = Curation.curationReport(multi, benchmark)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val s0 = rows("src0")
    assert(s0.getAs[Long]("docs_in") === 4L)
    assert(s0.getAs[Long]("n_repetitive") === 1L)
    assert(s0.getAs[Long]("n_contaminated") === 1L)
    assert(s0.getAs[Long]("n_unusual") === 0L)
    assert(s0.getAs[Long]("n_passed") === 2L) // docs 1, 2 (dup passes gates)
    assert(s0.getAs[Long]("n_kept") === 1L)   // dedup keeps only doc 1
    val s1 = rows("src1")
    assert(s1.getAs[Long]("docs_in") === 1L)
    assert(s1.getAs[Long]("n_passed") === 1L)
    assert(s1.getAs[Long]("n_kept") === 0L)   // winner lives in src0
    // report totals reconcile with the pipeline itself
    assert(rows.values.map(_.getAs[Long]("n_kept")).sum ===
      Curation.curate(multi, benchmark).count())
  }

  test("curationReport auto-releases the token cache after the action") {
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    assert(Curation.curationReport(corpus, benchmark).count() === 1)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(leaked.isEmpty, s"curationReport left persisted RDDs: $leaked")
  }

  test("gates are independent: relaxing one readmits only its offender") {
    // disable the contamination gate (threshold > 1 can never fire):
    // the benchmark copy returns; the repetitive and duplicate docs stay out
    val out = Curation.curate(corpus, benchmark, contaminationThreshold = 1.1)
      .collect().map(_.getLong(0)).toSeq.sorted // output is edge-sorted, not operator-sorted
    assert(out === Seq(1L, 4L))
  }

  test("fused pipeline matches the standalone gate operators' verdicts") {
    // the capstone inlines repetition and fuses contamination+LM into
    // one explode; every doc's per-gate verdict and lm_nll must equal
    // what the standalone oracled operators say
    import graft.textanalysis.TextAnalysis
    val rep = TextAnalysis.repetitionStats(corpus)
      .select("doc_id", "repetitive").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val con = TextAnalysis.contaminationStats(corpus, benchmark, "doc_id", "text")
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val lm = TextAnalysis.lmScore(corpus)
      .select("doc_id", "lm_nll").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = corpus.select("doc_id").collect().map(_.getLong(0))
      .filter(id => !rep(id) && !con(id) && lm(id) < 10.0)
    // min-id per text among survivors (docs 1/2 share text)
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val keep = expected.groupBy(texts).values.map(_.min).toSeq.sorted
    val out = Curation.curate(corpus, benchmark).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet.toSeq.sorted === keep)
    keep.foreach(id => assert(out(id) === lm(id), s"lm_nll drift for doc $id"))
  }

  test("curateManaged releases the internal token cache after the action") {
    val before = spark.sharedState.cacheManager.isEmpty
    val (managed, _) = Curation.curateManaged(corpus, benchmark)
    val got = managed { d => d.collect().map(_.getLong(0)).toSeq.sorted }
    assert(got === Seq(1L))
    // release() (via the scoping apply) unpersisted what curate cached
    assert(spark.sharedState.cacheManager.isEmpty || !before,
      "token cache must not outlive the managed scope")
  }

  test("corpusDiff classifies added/removed/changed/unchanged per id") {
    import spark.implicits._
    val old = Seq(
      (1L, "same text"),
      (2L, "will change"),
      (3L, "will vanish"),
      (5L, Option.empty[String].orNull) // null content survives digesting
    ).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "same text"),
      (2L, "has changed"),
      (4L, "brand new"),
      (5L, Option.empty[String].orNull)
    ).toDF("doc_id", "text")
    val out = Curation.corpusDiff(old, neu, "doc_id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("dropBottomRanked cuts ⌈n·tenths/10⌉ by (rank, node); unranked rows stay") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (99L, "z"))
      .toDF("doc_id", "text")
    val ranks = Seq((1L, 0.05), (2L, 0.05), (3L, 0.2), (4L, 0.7))
      .toDF("node", "rank")
    def kept(tenths: Int) =
      Curation.dropBottomRanked(df, ranks, "doc_id", tenths)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    // n = 4 → ⌈4/10⌉ = 1 drops; the 0.05 tie breaks by node → 1 goes.
    // doc 99 has no rank and is untouched.
    assert(kept(1) === Set(2L, 3L, 4L, 99L))
    // tenths = 5 → ⌈20/10⌉ = 2 → both 0.05 nodes drop
    assert(kept(5) === Set(3L, 4L, 99L))
    // tenths = 0 is the identity
    assert(kept(0) === Set(1L, 2L, 3L, 4L, 99L))
    // tenths = 10 drops every RANKED doc
    assert(kept(10) === Set(99L))
  }

  test("dropOutsideKCore drops in-graph docs outside the 2-core, " +
      "keeps core members and graph-absent docs") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
      (99L, "z")).toDF("doc_id", "text")
    // triangle {1,2,3} + pendant chain 3→4→5; 99 absent from the graph
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "t")
    val (out, rounds) = Curation.dropOutsideKCoreWithRounds(
      df, edges, "s", "t", "doc_id", 2)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    // 4 and 5 are in the graph but peel (5 first, then 4 — a 2-round
    // cascade); the triangle is the 2-core; 99 has no link evidence
    assert(kept === Set(1L, 2L, 3L, 99L))
    assert(rounds === 2)
  }

  test("capPerCommunity keeps the k lowest ids per community and " +
      "every graph-absent doc") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (10L, "d"), (11L, "e"),
      (12L, "f"), (99L, "z")).toDF("doc_id", "text")
    // two communities {1,2,3} and {10,11,12}; 99 absent
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L),
      (11L, 10L), (12L, 10L)).toDF("node", "community")
    val kept = Curation.capPerCommunity(df, labels, "doc_id", 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 10L, 11L, 99L))
    // k=1 collapses each community to its canonical exemplar
    val kept1 = Curation.capPerCommunity(df, labels, "doc_id", 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept1 === Set(1L, 10L, 99L))
  }
}
