package graft

import org.apache.spark.sql.functions.col
import graft.dedup.Dedup
import graft.ops._

/** Physical-plan assertions: the properties that make these operators
  * scale are load-bearing, so they're tested like behavior. If a
  * refactor turns a broadcast join into a shuffle or breaks filter
  * pushdown, these fail before a cluster run would.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Shuffle-exchange partitionings of a frame's physical plan — by
    * TREE traversal, so cached relations' one-time build plans (which
    * the string printer inlines under InMemoryRelation) don't count:
    * InMemoryTableScanExec is a leaf, its build plan isn't a child.
    */
  private def shufflePartitionings(
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Seq[String] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case other => other.collect {
        case e: ShuffleExchangeLike => e.outputPartitioning.toString }
    }
    walk(df.queryExecution.executedPlan)
  }

  lazy val orders = Tables.orders(spark, sfDir)
  lazy val customer = Tables.customer(spark, sfDir)
  lazy val lineitem = Tables.lineitem(spark, sfDir)

  test("point lookup pushes the key predicate into the parquet scan") {
    val p = plan(RelationalOps.pointLookup(orders, 42L))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"), p)
  }

  test("status lookup prunes to exactly the needed columns") {
    val p = plan(RelationalOps.statusLookup(orders, 42L))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"), p)
  }

  test("semi-join broadcasts the filtered dimension side") {
    val p = plan(RelationalOps.semiJoinExists(orders, customer, "BUILDING"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // the segment filter is pushed to the customer scan, not applied post-join
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("top-k compiles to TakeOrdered, not a global sort") {
    val p = plan(RelationalOps.topCustomers(orders, 10))
    assert(p.contains("TakeOrderedAndProject"), p)
    val p2 = plan(SearchOps.search(Tables.documents(spark, sfDir), "merge"))
    assert(p2.contains("TakeOrderedAndProject"), p2)
  }

  test("aggregations run partial+final (map-side combine)") {
    val p = plan(RelationalOps.pricingSummary(lineitem))
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("partial_sum") || p.contains("partial"), p)
  }

  test("revenue query broadcasts all dimension joins, shuffles only the fact join") {
    val p = plan(RelationalOps.revenueByRegion(lineitem, orders, customer,
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir)))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    // lineitem scan reads only the 3 needed columns of 11
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"), p)
  }

  test("IVF cell assignment is narrow and probes broadcast (vectors never shuffle)") {
    val p = plan(graft.similarity.Similarity.ivfTopK(
      Tables.embeddings(spark, sfDir), 0L, 10))
    assert(p.contains("BroadcastHashJoin"), p)
    // the only exchanges allowed are broadcasts + the final TakeOrdered's
    // singlePartition collect — never a hash repartition of the table
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("as-of join is one key shuffle + window, no join operator at all") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir).withColumn("tus", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"), col("event_id"))
    val p = plan(SessionOps.asofJoin(purchases, views, "user_id", "tus",
      "event_id", "view_event"))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p) // union+window, not a range join
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1, p)
  }

  test("range join probes buckets with a hash join, no cartesian product") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir).withColumn("tus", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"))
    val p = plan(SessionOps.windowedCountJoin(purchases, views,
      "user_id", "tus", 600000000L, "n"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("direct range-join path: one aggregation, no join-back to left") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir).withColumn("tus", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("tus"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("tus"))
    val p = plan(SessionOps.windowedCountJoin(purchases, views, "user_id",
      "tus", 600000000L, "n", leftRowsDistinct = true))
    // exactly one join (probe ⋈ right) — the default path has two
    // (probe join + count join-back)
    assert("Join".r.findAllIn(p).length <= "HashJoin|SortMergeJoin".r.findAllIn(p).length + 1)
    assert("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length === 1, p)
    // one aggregate pair (partial+final), grouped on the left row
    assert(!p.contains("Distinct"), p)
  }

  test("md5-mode near-dup signatures use the fused native expression") {
    // the interpreted transform/array_min md5 form is 2.5× slower —
    // a regression to it would silently tank the bench
    val docs = Tables.documents(spark, sfDir).limit(10)
    val m = Dedup.minhashNearDuplicatesManaged(docs, "doc_id", "text",
      hashMode = "md5")
    try {
      val p = m.df.queryExecution.analyzed.toString
      assert(p.contains("shingleminhashmd5") || p.contains("ShingleMinHashMd5"), p.take(2000))
    } finally m.release()
    val s = Dedup.simhashNearDuplicatesManaged(docs, "doc_id", "text",
      hashMode = "md5")
    try {
      val p = s.df.queryExecution.analyzed.toString
      assert(p.contains("simhashbandsmd5") || p.contains("SimHashBandsMd5"), p.take(2000))
    } finally s.release()
  }

  test("quality scorer stays in one codegen stage (no shuffle)") {
    val scored = graft.quality.RuleBasedScorer.score(
      Tables.documents(spark, sfDir), "text")
    val p = plan(scored)
    assert(!p.contains("Exchange"), p) // narrow end-to-end
  }

  test("BM25 broadcasts statistics and ranks with TakeOrdered") {
    val p = plan(graft.ops.SearchOps.searchBm25(
      Tables.documents(spark, sfDir), Seq("merge", "query"), 10))
    // document frequencies + corpus scalars ride broadcasts; the
    // corpus-sized frames never meet in a shuffled join
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // no global sort
  }

  test("boilerplate removal: broadcast anti-join, digest-only shuffle") {
    val p = plan(graft.dedup.Dedup.removeBoilerplate(
      Tables.documents(spark, sfDir), "doc_id", "text", 3, 3))
    // the over-threshold digest set broadcasts; the corpus-sized
    // occurrence side must not exchange on the digest key
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("chunking is narrow end-to-end (zero exchanges)") {
    val p = plan(graft.textanalysis.TextAnalysis.chunkDocuments(
      Tables.documents(spark, sfDir), chunkWords = 32, strideWords = 24))
    // split + bounded sequence explode + slices: chunking must run at
    // parquet-scan speed with the output partitioning inheriting the
    // input's — any Exchange here multiplies 100 TB by the shuffle
    assert(!p.contains("Exchange"), p)
  }

  test("sequence packing shuffles once on the shard key only") {
    val packed = graft.textanalysis.TextAnalysis.packSequences(
      Tables.documents(spark, sfDir), "doc_id",
      graft.textanalysis.TextAnalysis.tokenCount(col("text")), 512, 8)
    val p = plan(packed)
    // exactly one Exchange — the shard-key window; no global sort
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("repetition stats are narrow per-doc array math (no mid-plan shuffle)") {
    val docs = Tables.documents(spark, sfDir)
    val p = plan(graft.textanalysis.TextAnalysis.repetitionStats(docs))
    // the only exchange is the final deterministic orderBy's range
    // partitioning — no hash shuffle, no join, no aggregation
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Join"), p)
  }

  test("decontamination broadcasts the benchmark grams; corpus shuffles only on doc id") {
    val docs = Tables.documents(spark, sfDir)
    val p = plan(graft.textanalysis.TextAnalysis.contaminationStats(
      docs.filter(col("doc_id") % 101 =!= 7),
      docs.filter(col("doc_id") % 101 === 7), "doc_id", "text"))
    // corpus grams never reshuffle to meet the benchmark — the small
    // side rides a broadcast
    assert(p.contains("BroadcastHashJoin"), p)
    // exactly two hash exchanges: the benchmark-side distinct (small,
    // pre-broadcast) and the corpus aggregation on the doc id — the
    // corpus gram stream itself never hash-repartitions
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, p)
    assert(p.contains("Exchange hashpartitioning(doc_id"), p)
  }

  test("quota mix prunes unlisted strata at the scan and shuffles once") {
    val docs = Tables.documents(spark, sfDir)
    val p = plan(SampleOps.quotaMix(docs, "source", "doc_id",
      Seq("src0" -> 7L, "src1" -> 3L)))
    // the stratum IN-list reaches the parquet scan
    assert(p.contains("In(source"), p)
    // one window shuffle on the stratum key
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
  }

  test("takeExact compiles to TakeOrdered, not a global sort") {
    val p = plan(SampleOps.takeExact(Tables.documents(spark, sfDir),
      "doc_id", 40))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("top n-grams: map-side combine, top-k without a global sort") {
    val p = plan(graft.textanalysis.TextAnalysis.topNgrams(
      Tables.documents(spark, sfDir), 2, 20))
    // shuffle state is one row per distinct gram per partition
    assert(p.contains("partial_count"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("weighted sample is a pure narrow filter: zero exchanges") {
    val p = plan(SampleOps.weightedSample(Tables.documents(spark, sfDir),
      "doc_id", col("n_chars") / org.apache.spark.sql.functions.lit(1000.0)))
    assert(!p.contains("Exchange"), p)
  }

  test("lm score: model joins hash on the gram key, scalars broadcast") {
    val p = plan(graft.textanalysis.TextAnalysis.lmScore(
      Tables.documents(spark, sfDir)))
    // the vocabulary-size scalar rides a broadcast; nothing cartesian
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("semdedup: pairwise join hashes on the cell key, never cartesian") {
    val emb = Tables.embeddings(spark, sfDir)
    val p = plan(graft.similarity.Similarity.semanticDuplicates(emb,
      graft.similarity.Similarity.seedCentroids(emb, 4), 0.999))
    assert(!p.contains("CartesianProduct"), p)
    // the within-cell pair stage is an equi-join on cell (+ survivor
    // anti-join); nothing degenerates to a nested loop over vectors
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("segment dedup: two shuffles, one scan, no join operator") {
    val p = plan(Dedup.segmentDedup(Tables.documents(spark, sfDir),
      "doc_id", "text"))
    // the group winner IS the kept occurrence — digest agg + doc
    // rebuild are the only exchanges, no join-back, and no baked-in
    // global sort (ordering belongs to the caller, not the operator)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Join"), p)
    assert("FileScan parquet".r.findAllIn(p).length === 1, p)
  }

  test("quantized top-k: broadcast query, narrow scan, TakeOrdered") {
    val q = graft.similarity.Similarity.quantizeEmbeddings(
      Tables.embeddings(spark, sfDir))
    val p = plan(graft.similarity.Similarity.quantizedTopK(q, 0L, 10))
    // the corpus side never hash-shuffles: one broadcast of the query
    // row, integer dots in the scan projection, per-partition top-k
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("curation capstone: one corpus scan in the gate plan, no operator-level sort") {
    import spark.implicits._
    val bench = Seq((900L, "alpha beta gamma delta", "bench"))
      .toDF("doc_id", "text", "source")
    val out = graft.curation.Curation.curate(
      Tables.documents(spark, sfDir), bench)
    val p = plan(out)
    // scan 1 (base) + the tokenization pass materialized columnar:
    // every other consumer reads InMemoryTableScan, so the corpus is
    // read at most twice (base + the one cache build), ever
    assert(p.contains("InMemoryTableScan"), p)
    // no global sort inside the operator (callers sort at the edge)
    assert(!p.contains("Exchange rangepartitioning"), p)
    spark.catalog.clearCache()
  }

  test("corpus diff and duplication profile carry no operator-level global sort") {
    val docs = Tables.documents(spark, sfDir)
    val pd = plan(graft.curation.Curation.corpusDiff(
      docs, docs.filter(col("doc_id") % 13 =!= 0), "doc_id", Seq("text")))
    assert(!pd.contains("Exchange rangepartitioning"), pd)
    val pp = plan(Dedup.duplicationProfile(docs))
    assert(!pp.contains("Exchange rangepartitioning"), pp)
  }

  test("training shards: one shard-key shuffle, no global sort") {
    val p = plan(SampleOps.trainingShards(
      Tables.documents(spark, sfDir).select("doc_id"), "doc_id", 8))
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("pagerank round: single exchange, no broadcast — edges cached co-partitioned") {
    import org.apache.spark.sql.functions._
    val k = orders.select(col("o_orderkey").as("k"))
    val e = k.select(col("k").as("src"), (col("k") - col("k") % 4).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("dout"))
    val adj = e.join(deg, "src").select(col("src"), col("dst"), col("dout"))
      .repartition(col("src")).persist()
    try {
      adj.count()
      val ranks = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct()
        .join(deg.select(col("src").as("node"), lit(false).as("dangling")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("dangling"), lit(true)).as("dangling"))
        .repartition(col("node"))
        .withColumn("rank", lit(0.01))
        .localCheckpoint(true)
      // the PLANS.md claim: the O(edges) adjacency cache is scanned
      // in place — no exchange in the ROUND keys on src/dst, so every
      // shuffle moves only O(nodes) rank rows. (While the rank frame
      // is small Catalyst broadcasts it into the contribution join by
      // size; at scale that side becomes a join that exchanges rank
      // rows only — either way edges stay put.) The cache's one-time
      // BUILD subtree legitimately shuffles on src: the plan printer
      // inlines it under InMemoryRelation, so strip those subtrees
      // before asserting on the per-round operators.
      val round = graft.graph.PageRank.rankRound(adj, ranks, 100.0, 0.85, 0.0)
      val parts = shufflePartitionings(round)
      assert(parts.forall(s => !s.contains("src") && !s.contains("dst")), parts)
      assert(parts.length <= 3, parts)
      assert(plan(round).contains("InMemoryTableScan"), plan(round))
    } finally adj.unpersist()
  }

  test("incremental probe: index bucket rows are never shuffled, no window cap") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val index = Dedup.minhashSignatures(docs, "doc_id", "text", 3, 16, "xx")
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    // smallBatchRows = 0 forces the distributed probe (the fast path
    // would collect this tiny batch and leave no joins to pin)
    val p = plan(Dedup.incrementalNearDuplicates(batch, index,
      "doc_id", "text", smallBatchRows = 0))
    // the skew cap is a TOUCHED-bucket-restricted count (broadcast
    // semi-join of the batch's bucket keys into the index scan, then
    // batch-bounded aggregations) + one broadcast anti-join — NOT a
    // count window (which would re-shuffle every index bucket row on
    // every increment) and NOT a full index recount; the candidate
    // probe broadcasts the NEW side so the index is scanned, never
    // exchange-shuffled: every remaining hash exchange carries
    // batch-proportional data (bucket sizes, candidate pairs)
    assert(!p.contains("Window"), p)
    val probes = "BroadcastHashJoin".r.findAllIn(p).length
    assert(probes >= 3, p) // touched semi + big anti + new-side probe
  }

  test("lshCandidates is plan-identical to the pre-factoring Jaccard candidate code") {
    // the r6 refactor moved the Jaccard verifier's candidate
    // generation into the shared lshCandidates; this pins the claim
    // that the factoring changed nothing in the physical plan —
    // compare against an inline replica of the original code,
    // normalized only for expression ids
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val base = Dedup.minhashSignatures(
      Tables.documents(spark, sfDir), "doc_id", "text", 3, 16, "xx")
    val current = Dedup.lshCandidates(base, "xx", 16, 4, 100)
    val buckets = base
      .select(col("id"), posexplode(Dedup.bandHashes(col("sig"), 16, 4)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
    val small = buckets
      .withColumn("bsz", count(lit(1))
        .over(Window.partitionBy(col("band"), col("bucket"))))
      .filter(col("bsz") <= 100)
      .drop("bsz")
    val legacy = small.as("l")
      .join(small.as("r"),
        col("l.band") === col("r.band") &&
        col("l.bucket") === col("r.bucket") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    def norm(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
        .replaceAll("@[0-9a-f]+", "@x").replaceAll("x_\\d+", "x_n")
    assert(norm(current) === norm(legacy))
    // and the scale properties independently of string equality:
    // one skew-cap window, a real hash join on (band, bucket)
    val p = plan(current)
    assert("Window".r.findAllIn(p).length >= 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("centroid drift reads the checkpointed sums, not the corpus; global vec broadcasts") {
    val p = plan(graft.similarity.Similarity.centroidDrift(
      Tables.embeddings(spark, sfDir)))
    // the corpus scan ran ONCE into the eager localCheckpoint; the
    // result plan reads that materialized frame on both branches
    assert(!p.contains("Scan parquet"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("dsir scoring is a zero-exchange narrow pass; select is TakeOrdered") {
    val docs = Tables.documents(spark, sfDir)
    val m = graft.selection.Dsir.dsirTrain(docs,
      docs.filter(col("lang") === "en"), 64)
    // the ratio table rides as a literal: scoring shuffles nothing
    assert(shufflePartitionings(graft.selection.Dsir.dsirScore(docs, m)).isEmpty)
    val p = plan(graft.selection.Dsir.dsirSelect(docs, m, 50))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }
}
