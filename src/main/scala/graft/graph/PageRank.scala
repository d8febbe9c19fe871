package graft.graph

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** PageRank over a directed edge list — the link-graph centrality
  * prior large-corpus curation pipelines attach to crawled documents
  * (seed-quality propagation in the CCNet/RefinedWeb lineage;
  * Page et al. '99 for the model): a page's rank is the stationary
  * probability of a damping-d random surfer, teleporting uniformly
  * with probability 1−d.
  *
  * Spark-first power iteration, shaped like
  * [[graft.dedup.Dedup.connectedComponents]]'s scale path:
  *
  *  - The edge list (with each source's out-degree joined in) is
  *    hash-partitioned on `src` ONCE and persisted; every round's
  *    contribution join then reuses that layout and shuffles only
  *    the (node, rank) frame — 16 bytes/node — never the edges.
  *    While the node count is bounded (≤ 2M) the rank frame is
  *    broadcast-hinted instead, making a round one edge-cache scan
  *    plus the contribution aggregation's tiny partial-agg shuffle.
  *  - Dangling mass (rank sitting on nodes with no out-edges —
  *    dropped on the floor by the contribution join) is
  *    redistributed uniformly, per the standard model. The mass is
  *    measured by an `observe()` metric riding the NEXT round's
  *    checkpoint materialization — the scalar costs zero extra jobs
  *    and feeds the following round as a literal, so no per-round
  *    cross-join or driver collect() of data rows.
  *  - Each round ends in an eager localCheckpoint cutting lineage
  *    (flat plans regardless of iteration count), with the previous
  *    round's blocks freed immediately.
  *
  * Self-edges are dropped up front (they only delay convergence and
  * make every node non-dangling); parallel edges collapse to one
  * (distinct), matching the unweighted adjacency-matrix model.
  * Convergence: `iterations` is the exact round count (the form the
  * cross-engine oracle replays); `tol > 0` adds an early stop when
  * the L1 rank delta — also measured as a riding observation —
  * falls to `tol` or below.
  *
  * Output: (node, rank), one row per node that appears in any
  * non-self edge, ranks summing to 1 (PageRankSpec pins the
  * invariant). UNORDERED by repo convention; callers sort at the
  * query edge.
  */
object PageRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, damping: Double = 0.85,
      tol: Double = 0.0): DataFrame =
    pageRankWithRounds(edges, srcCol, dstCol, iterations, damping, tol)._1

  private[graft] def pageRankWithRounds(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int, damping: Double,
      tol: Double): (DataFrame, Int) = {
    require(iterations >= 1, s"iterations must be ≥ 1: $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1): $damping")
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("dout"))
    // the per-round join reuses this layout: partitioned by the join
    // key once, scanned from cache every round
    val adj = e.join(deg, "src")
      .select(col("src"), col("dst"), col("dout"))
      .repartition(col("src"))
      .persist()
    // (node, dangling) — dangling flagged ONCE so each round's mass
    // readout is a plain conditional sum riding the checkpoint
    val obs0 = Observation()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(deg.select(col("src").as("node"), lit(false).as("dangling")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("dangling"), lit(true)).as("dangling"))
      .repartition(col("node"))
      .persist()
    val nNodes = nodes.count()
    if (nNodes == 0) {
      Seq(e, adj, nodes).foreach(_.unpersist())
      import spark.implicits._
      return (Seq.empty[(Long, Double)].toDF("node", "rank"), 0)
    }
    // NO broadcast hint, deliberately: the rank frame leaves each
    // round hash-partitioned on `node` (localCheckpoint preserves the
    // physical partitioning), and the adjacency cache is partitioned
    // on `src` with the same partition count — so the contribution
    // join is already exchange-free co-partitioned SMJ. A broadcast
    // hint here would ADD a per-round broadcast-build job (collect +
    // rebroadcast of the checkpointed frame) to save an exchange the
    // plan doesn't have; measured ~0.1 s/round slower at bench scale,
    // and at cluster scale the rank frame outgrows broadcast anyway.
    val n = nNodes.toDouble
    val danglingSum = sum(when(col("dangling"), col("rank"))
      .otherwise(lit(0.0))).as("dangling_mass")
    var checkpointed = nodes
      .withColumn("rank", lit(1.0 / n))
      .observe(obs0, danglingSum)
      .localCheckpoint(true)
    var ranks = checkpointed
    var dm = obs0.get("dangling_mass").asInstanceOf[Double]
    var it = 0
    var delta = Double.MaxValue
    while (it < iterations && delta > tol) {
      val obs = Observation()
      val contribs = adj
        .join(ranks.select(col("node"), col("rank")),
          col("src") === col("node"))
        .select(col("dst").as("node"), (col("rank") / col("dout")).as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("contrib"))
      // same op shape as the oracle replay: (1−d)/n + d·(contrib+dm/n)
      // — IEEE ops are deterministic, so identical shapes give
      // identical bits up to the summation-order ulps the query-edge
      // round() absorbs. Left side is the previous rank frame (same
      // node set every round), so the L1-delta metric below reads the
      // old rank from the very same join.
      val next = ranks
        .select(col("node"), col("dangling"), col("rank"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("dangling"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + lit(dm / n)))
            .as("rank"),
          col("rank").as("prev"))
        .observe(obs, danglingSum,
          sum(abs(col("rank") - col("prev"))).as("l1_delta"))
        .localCheckpoint(true)
      dm = obs.get("dangling_mass").asInstanceOf[Double]
      delta = obs.get("l1_delta").asInstanceOf[Double]
      checkpointed.unpersist()
      checkpointed = next
      ranks = next
      it += 1
    }
    Seq(e, adj, nodes).foreach(_.unpersist())
    (ranks.select(col("node"), col("rank")), it)
  }
}
