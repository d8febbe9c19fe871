package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by synchronous peeling: repeatedly drop every
  * node whose degree WITHIN the surviving subgraph is below k, until
  * a fixpoint. The classic graph-quality prior (Seidman '83): spam
  * farms and template clusters survive high-k cores that organic
  * pages don't, and conversely a page outside the 2-core is a leaf
  * chain. Synchronous rounds (all sub-k nodes drop together) make
  * the result order-independent — the fixpoint is THE k-core, and
  * every round is exactly replayable relationally (the generated
  * DuckDB oracle chains one CTE per recorded round).
  *
  * Scale shape: the canonical undirected edge list is built once;
  * each round is one degree aggregation over the filtered edges plus
  * a semi-join filter — per-round exchange volume is O(alive edges),
  * monotonically shrinking, and the alive set localCheckpoints per
  * round so lineage stays flat (the components/PageRank round
  * pattern). Round COUNT is data-dependent but bounded by the
  * longest peel chain (≤ diameter-ish); the driver sees one Long
  * count per round, never row data.
  */
object KCore {

  final case class KCoreResult(members: DataFrame, rounds: Int)

  /** The node set of the canonical undirected graph [[kCore]] peels —
    * exposed so callers composing "in-graph but outside the core"
    * predicates (the curation gate) share THIS canonicalization
    * (null/self-loop drop, undirected collapse) instead of deriving
    * their own and drifting.
    */
  def graphNodes(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
    und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .distinct()
  }

  /** Nodes of the k-core with their within-core degree. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxRounds: Int = 100): KCoreResult = {
    require(k >= 1, s"k must be >= 1: $k")
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    // both directions, so degree is one groupBy on the first column
    val sym = und.unionByName(
      und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    var alive = sym.select(col("u").as("node")).distinct()
      .localCheckpoint(true)
    var aliveCount = alive.count()
    var rounds = 0
    var done = aliveCount == 0
    while (!done) {
      val next = sym
        .join(alive.select(col("node").as("u")), Seq("u"))
        .join(alive.select(col("node").as("v")), Seq("v"))
        .groupBy(col("u")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k)
        .select(col("u").as("node"))
        .localCheckpoint(true)
      val nextCount = next.count()
      if (nextCount == aliveCount) {
        // fixpoint confirmed — the budget only limits SHRINK rounds,
        // so reaching it on the confirming pass is success
        graft.Frames.freeLocalCheckpoint(next)
        done = true
      } else if (rounds >= maxRounds) {
        // a silent early stop would return a SUPERSET of the k-core;
        // fail loudly instead — the caller raises the budget
        graft.Frames.freeLocalCheckpoint(next)
        throw new IllegalStateException(
          s"k-core did not reach a fixpoint in $maxRounds rounds " +
            s"($aliveCount nodes still alive) — raise maxRounds")
      } else {
        // the superseded round's checkpoint blocks free NOW, not at
        // GC time — Dataset.unpersist is a no-op on localCheckpoint
        // blocks (CacheManager never tracked them), so free the
        // underlying checkpointed RDD itself
        graft.Frames.freeLocalCheckpoint(alive)
        alive = next
        aliveCount = nextCount
        rounds += 1
        if (aliveCount == 0) done = true
      }
    }
    val members = sym
      .join(alive.select(col("node").as("u")), Seq("u"))
      .join(alive.select(col("node").as("v")), Seq("v"))
      .groupBy(col("u")).agg(count(lit(1)).as("core_degree"))
      .select(col("u").as("node"), col("core_degree"))
      .orderBy(col("node"))
    KCoreResult(members, rounds)
  }
}
