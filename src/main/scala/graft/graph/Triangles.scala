package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact triangle counting + local clustering coefficient over an
  * edge list — the link-graph structure readout that complements
  * [[PageRank]]'s centrality: a crawl frontier with high clustering
  * is a community (or a link farm); near-zero clustering at high
  * degree is hub-like. Classic node-iterator++ formulation
  * (Schank & Wagner '05; the MapReduce shape popularized by
  * Suri & Vassilvitskii '11's "Counting triangles and the curse of
  * the last reducer").
  *
  * Scale design — the part that matters at 10^11 edges:
  *  - Edges canonicalize undirected (least, greatest), self-loops
  *    drop, duplicates collapse in the same exchange that the
  *    degree count uses.
  *  - Every edge then ORIENTS from lower (degree, id) to higher —
  *    the total order makes each triangle counted exactly once, and
  *    ordering by DEGREE first is the heavy-hitter bound: a node's
  *    out-degree in the oriented graph is at most O(√m), so the
  *    2-path join that a star head would otherwise explode
  *    quadratically is capped (the "curse of the last reducer" fix).
  *  - 2-paths join oriented edges on their source and close against
  *    the oriented edge set — two hash joins on edge keys, no
  *    cartesian anywhere; AQE handles residual key skew.
  *
  * Readout per node: degree, triangle count, and the local
  * clustering coefficient 2t/(d(d−1)) at 4 decimals via the exact
  * long-division form (the tokenFertility contract — no binary
  * double before the final exact /10⁴).
  */
object Triangles {

  private def rankLt(da: Column, a: Column, db: Column, b: Column): Column =
    da < db || (da === db && a < b)

  /** Canonical undirected edge list + per-node degrees — the shared
    * front of every whole-graph statistic here.
    */
  private def undAndDeg(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    (und, deg)
  }

  /** Degree assortativity (Newman '02): Pearson correlation of the
    * endpoint degrees over the undirected edges, each edge counted in
    * both orientations (the standard symmetric form). Social-ish
    * graphs run positive (hubs link hubs); crawled web and citation
    * graphs run negative — a corpus-level structure readout next to
    * the per-node triangle/k-core priors.
    *
    * Exactness: all five moment sums (m, Σx, Σxy, Σx², Σy²) are
    * exact longs (ANSI overflow surfaces loudly rather than
    * wrapping), and the ONE division happens once per graph on a
    * single row — identical IEEE in any engine, rounded at 4. Zero
    * degree variance (every endpoint equal) reads NULL, not NaN.
    *
    * Scale: the degree aggregation, two node-keyed joins onto the
    * edge list, and a global 5-sum rollup — nothing quadratic, no
    * driver data.
    */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val (und, deg) = undAndDeg(edges, srcCol, dstCol)
    val sym = und.unionByName(
      und.select(col("v").as("u"), col("u").as("v")))
    val joined = sym
      .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
    joined
      .agg(count(lit(1)).as("m"),
        sum(col("du")).as("sx"),
        sum(col("dv")).as("sy"),
        sum(col("du") * col("dv")).as("sxy"),
        sum(col("du") * col("du")).as("sxx"),
        sum(col("dv") * col("dv")).as("syy"))
      .select((col("m") / 2).cast("long").as("n_edges"),
        when(
          (col("m") * col("sxx") - col("sx") * col("sx")) > 0 &&
            (col("m") * col("syy") - col("sy") * col("sy")) > 0,
          round(
            (col("m") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt((col("m") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
                (col("m") * col("syy") - col("sy") * col("sy"))
                  .cast("double")), 4))
          .as("assortativity"))
  }

  /** Per-node degrees plus the closed-triangle frame (s, a, b) —
    * shared by the per-node rollup and the global count.
    */
  private def degreesAndTriangles(edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val (und, deg) = undAndDeg(edges, srcCol, dstCol)
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("degree").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("dv")), "v")
    val uLower = rankLt(col("du"), col("u"), col("dv"), col("v"))
    // oriented edge (src → dst) with the DST's rank carried along so
    // the 2-path join can order its two legs without a re-join
    val oriented = withDeg.select(
      when(uLower, col("u")).otherwise(col("v")).as("src"),
      when(uLower, col("v")).otherwise(col("u")).as("dst"),
      when(uLower, col("dv")).otherwise(col("du")).as("dd"))
    val o1 = oriented.select(col("src"), col("dst").as("a"), col("dd").as("da"))
    val o2 = oriented.select(col("src"), col("dst").as("b"), col("dd").as("db"))
    val paths = o1.join(o2, Seq("src"))
      .filter(rankLt(col("da"), col("a"), col("db"), col("b")))
      .select(col("src").as("s"), col("a"), col("b"))
    val triangles = paths.join(oriented,
      paths("a") === oriented("src") && paths("b") === oriented("dst"))
      .select(col("s"), col("a"), col("b"))
    (deg, triangles)
  }

  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val (deg, triangles) = degreesAndTriangles(edges, srcCol, dstCol)
    val triPerNode = triangles.select(col("s").as("node"))
      .union(triangles.select(col("a").as("node")))
      .union(triangles.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          expr("(2 * triangles * 20000 + degree * (degree - 1)) div " +
            "(2 * degree * (degree - 1))") / lit(10000.0))
          .otherwise(lit(0.0)))
      .orderBy(col("node"))
  }

  /** Global triangle count — one row, counted straight off the
    * closed-triangle frame (no per-node rollup, no degree join, no
    * operator-level sort to discard).
    */
  def triangleCount(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    degreesAndTriangles(edges, srcCol, dstCol)._2
      .agg(count(lit(1)).as("n_triangles"))

  /** One-row whole-graph readout: node/edge counts, global triangle
    * count, and degree assortativity — the structure dashboard a
    * link-graph curation run records next to its per-node priors.
    * Three bounded single-row frames cross-joined by broadcast; edge
    * count derives from Σdegree/2 (exact — the sum is even).
    */
  def graphSummary(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val (deg, triangles) = degreesAndTriangles(edges, srcCol, dstCol)
    // coalesce: an edgeless graph has sum(degree) = NULL, but the
    // readout (and the count(*)-form oracle) should say 0 edges
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      (coalesce(sum(col("degree")), lit(0L)) / 2).cast("long").as("n_edges"))
    val tri = triangles.agg(count(lit(1)).as("n_triangles"))
    val asrt = assortativity(edges, srcCol, dstCol)
      .select(col("assortativity"))
    nodes.crossJoin(broadcast(tri)).crossJoin(broadcast(asrt))
  }
}
