package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and splitting — the selection ops a
  * training-data pipeline runs before anything else (subsample a
  * 100 TB crawl, carve train/val/test). Everything here derives its
  * "randomness" from md5 of the row id, so results are exactly
  * reproducible across runs, engines, and cluster layouts — no RNG
  * state, no seed plumbing, and every query is DuckDB-oracle-able.
  *
  * Two sampling shapes, picked by what must be exact:
  *  - [[hashSample]] — NARROW: a filter on the hash prefix. Zero
  *    shuffle, streams through 100 TB; the sampled fraction is only
  *    approximately `fraction` (hash-uniform), which is what corpus
  *    subsampling wants.
  *  - [[stratifiedSample]] — EXACT per-stratum counts via one window
  *    (one shuffle on the stratum key). Use when proportions are a
  *    contract, not a target.
  */
object SampleOps {

  /** Engine-portable deterministic order: md5 hex of the id. */
  def hashOrder(id: Column): Column = md5(id.cast("string"))

  /** First 8 hex chars of the hash — lexicographic compare on hex is
    * numeric compare on the top 32 bits.
    */
  private def hashPrefix(id: Column): Column =
    substring(hashOrder(id), 1, 8)

  /** The 8-hex boundary below which a hash-uniform value falls with
    * probability `fraction`.
    */
  def fractionBoundary(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    val v = math.min((fraction * 4294967296.0).toLong, 0xffffffffL)
    f"$v%08x"
  }

  /** Narrow hash sample: keeps rows whose hash prefix falls below the
    * fraction boundary. No shuffle — the filter pushes into the scan.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashPrefix(col(idCol)) < lit(fractionBoundary(fraction)))

  /** Exact stratified sample: the first ceil(fraction·|stratum|) rows
    * of every stratum in hash order (id tiebreak). One shuffle on the
    * stratum key; exact proportions per stratum.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    val whole = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(ord))
      .withColumn("__n", count(lit(1)).over(whole))
      .filter(col("__rn") <= ceil(lit(fraction) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Exact-n deterministic sample PER STRATUM: the first `n` of each
    * stratum in (md5(id), id) order — the count-denominated form of
    * [[stratifiedSample]] (which keeps a FRACTION). Mixture recipes
    * that specify "exactly n documents per source" need the count
    * form; hash order makes it reproducible and growth-stable (a
    * stratum gaining documents never evicts an earlier pick until n
    * is exceeded... the kept set under a bigger corpus is decided by
    * hash order alone). One stratum-keyed window shuffle, the
    * [[stratifiedSample]] scale shape.
    */
  def takeExactPerStratum(df: DataFrame, strataCol: String,
      idCol: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Curriculum binning: within each stratum, rank documents by a
    * quality signal (best first, id tie-break) and deal them into
    * `nBins` equal-size bins — bin 1 is the cleanest slice, the one
    * curriculum-ordered training consumes first. Per-STRATUM by
    * design: curricula are scheduled per source/language in mixture
    * recipes, and the stratum key is what keeps the window
    * distributed (one shuffle on `strataCol`, the
    * [[stratifiedSample]] shape — a global ntile would serialize the
    * corpus through one partition).
    */
  def curriculumBins(df: DataFrame, strataCol: String, idCol: String,
      quality: Column, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive: $nBins")
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(quality.desc, col(idCol))
    df.withColumn("bin", ntile(nBins).over(ord))
  }

  /** Deterministic train/val/test (or any weighted) split: each row
    * lands in the first bucket whose cumulative boundary exceeds its
    * hash prefix. Narrow — a pure projection; rows never move.
    * Weights must sum to 1 (±1e-9); the last bucket absorbs rounding.
    */
  def splitColumn(id: Column, weights: Seq[(String, Double)]): Column = {
    require(weights.nonEmpty, "need at least one split bucket")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${weights.map(_._2).sum}")
    val h = hashPrefix(id)
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    weights.init.zip(cum.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), bound), rest) =>
        when(h < lit(fractionBoundary(bound)), lit(name)).otherwise(rest)
    }
  }

  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], outCol: String = "split"): DataFrame =
    df.withColumn(outCol, splitColumn(col(idCol), weights))

  /** Leakage-safe train/val/test split: the split key is the row's
    * near-dup CLUSTER label instead of its own id, so every member
    * of a duplicate family lands in the same bucket — a near-copy of
    * a training document can never leak into the eval split, the
    * failure mode a plain id-keyed split has on an undeduped corpus.
    * `clusters` is the (node, component) frame of
    * [[graft.dedup.Dedup.minhashClusters]]; unclustered rows key on
    * their own id (they ARE their own family).
    *
    * Scale shape: one join against the cluster frame (ids only —
    * tiny relative to the corpus, and only cluster members match),
    * then the same narrow hash-boundary projection as [[hashSplit]].
    */
  def leakageSafeSplit(df: DataFrame, clusters: DataFrame, idCol: String,
      weights: Seq[(String, Double)], outCol: String = "split"): DataFrame =
    df
      .join(clusters.select(col("node").as("__sn"),
        col("component").as("__sc")), col(idCol) <=> col("__sn"), "left")
      .withColumn(outCol,
        splitColumn(coalesce(col("__sc"), col(idCol)), weights))
      .drop("__sn", "__sc")

  /** Exactly-n corpus cut in deterministic hash order — "give me a
    * 10M-document budget from this crawl", reproducible anywhere.
    * Compiles to TakeOrdered (per-partition top-n + driver merge of
    * n-row heads), never a global sort: the only data movement is
    * n rows per partition. Monotone in n: a bigger budget is a
    * superset of a smaller one.
    */
  def takeExact(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 0, s"budget must be non-negative: $n")
    df.orderBy(hashOrder(col(idCol)), col(idCol)).limit(n)
  }

  /** Per-row weighted Bernoulli sample, deterministic: a row with
    * acceptance probability `prob` (clamped to [0,1]) is kept iff its
    * md5 prefix falls below the row's own boundary — the
    * quality-proportional downsampling step of corpus curation
    * ("keep good documents with higher probability"), reproducible
    * across runs, engines, and cluster layouts exactly like
    * [[hashSample]] (which is the constant-probability special case).
    *
    * NARROW: the boundary is a projection of the row's own columns
    * and the comparison is a filter — zero shuffle, streams through
    * 100 TB at scan speed. Same 2^-32 edge as [[fractionBoundary]]:
    * prob 1.0 maps to boundary ffffffff, so the one-in-4-billion row
    * hashing exactly ffffffff is excluded even at prob 1.
    */
  def weightedSample(df: DataFrame, idCol: String, prob: Column): DataFrame = {
    val p = least(greatest(prob.cast("double"), lit(0.0)), lit(1.0))
    val bound = least(floor(p * 4294967296.0).cast("long"), lit(0xffffffffL))
    df.filter(hashPrefix(col(idCol)) < lpad(lower(hex(bound)), 8, "0"))
  }

  /** Per-stratum TOKEN-budget corpus cut — the token-denominated
    * sibling of [[quotaMix]]: within each stratum, keep documents in
    * deterministic hash order while the running token total of the
    * kept prefix (current document included) stays within `budget`.
    * "At most N training tokens per source/language" is the mixture
    * contract LLM data recipes actually specify — document counts
    * are a proxy, tokens are the real denominator. Token counts are
    * non-negative, so the cumulative sum is monotone: once a stratum
    * crosses the budget every later document drops too (prefix
    * semantics — a bigger budget yields a superset), and a document
    * larger than the whole budget empties its stratum's cut from its
    * rank onward.
    *
    * Scale shape: ONE window shuffle on the stratum key (identical
    * to [[stratifiedSample]]); the cumulative sum is exact long
    * arithmetic, so the cut point is engine-reproducible.
    */
  def tokenBudgetMix(df: DataFrame, strataCol: String, idCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"token budget must be non-negative: $budget")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokens.cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Deterministic global shuffle + shard assignment for training
    * order: shard = (top 32 bits of md5(id)) mod `nShards`, position
    * = dense rank within the shard in md5 order (id tiebreak). The
    * (shard, pos) pair is a total order over the corpus that is
    * reproducible across runs, engines, and cluster layouts — the
    * "global shuffle" a training run needs before sharding examples
    * to data-loader workers, with no RNG state to plumb.
    *
    * Scale shape: the shard is NARROW (a projection of the row's own
    * id — streams at scan speed); the position is one shuffle on the
    * shard key + an in-partition sort, exactly the writer pattern
    * `repartition($"shard").sortWithinPartitions("pos")` — each
    * shard streams to its writer with no global sort ever
    * materializing.
    */
  def trainingShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"shard count must be positive: $nShards")
    val shard =
      (conv(hashPrefix(col(idCol)), 16, 10).cast("long") % nShards).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Materialize [[trainingShards]] as the physical training layout:
    * one parquet directory per shard, rows ordered by `pos` within
    * each shard's files — a data-loader worker reads its own
    * directory front-to-back and sees the deterministic global
    * shuffle. The write co-locates each shard before writing
    * (repartition on the shard key + in-partition sort), so no
    * global sort materializes and each shard streams to one writer —
    * the exact plan the [[trainingShards]] docstring promises.
    */
  def writeTrainingShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): Unit =
    trainingShards(df, idCol, nShards)
      .repartition(col("shard"))
      // sort by (shard, pos): the partition column must lead so the
      // writer's required ordering is already satisfied — sorting by
      // pos alone makes FileFormatWriter insert its OWN sort on shard,
      // and per-shard pos order then hangs on sort stability, which
      // UnsafeExternalSorter does not guarantee once it spills
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-stratum temperature-sampling weights — the multinomial
    * α-mixing of multilingual/multi-source corpora (XLM, mT5): the
    * target share of stratum s is p_s^α / Σ_t p_t^α, flattening the
    * mixture toward uniform as α → 0. `keep_prob` realizes the
    * target mixture by DOWNSAMPLING ONLY, scaled so the most-boosted
    * stratum (the smallest, for α < 1) keeps everything:
    *
    *   keep_s = (n_min / n_s)^(1-α)   ∈ (0, 1]
    *
    * Cross-engine contract: pow/ln are libm-dependent in the last
    * ulp, so each pow term rounds before use — target shares go
    * through integer nano-weights (round(n^α·1e9) summed as exact
    * longs, order-independent), keep_prob rounds to 6 places. The
    * stratum table is tiny (one row per source) and rides broadcast.
    */
  def temperatureWeights(df: DataFrame, strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val nano = round(pow(col("n_docs"), alpha) * 1e9).cast("long")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(
      sum(col("n_docs")).as("__n"),
      min(col("n_docs")).as("__n_min"),
      sum(nano).as("__t_sum"))
    counts.crossJoin(broadcast(tot))
      .select(
        col(strataCol),
        col("n_docs"),
        round(col("n_docs") / col("__n"), 6).as("share"),
        round(nano / col("__t_sum"), 6).as("target_share"),
        round(pow(col("__n_min") / col("n_docs"), 1.0 - alpha), 6)
          .as("keep_prob"))
      .orderBy(col(strataCol))
  }

  /** Temperature-based corpus downsampling: every row keeps with its
    * stratum's [[temperatureWeights]] probability via the same
    * deterministic md5-Bernoulli as [[weightedSample]]. One broadcast
    * join (the weight table is one row per stratum) then a narrow
    * filter — streams through 100 TB at scan speed.
    */
  def temperatureSample(df: DataFrame, strataCol: String, idCol: String,
      alpha: Double): DataFrame = {
    val w = temperatureWeights(df, strataCol, alpha)
      .select(col(strataCol), col("keep_prob"))
    weightedSample(df.join(broadcast(w), strataCol), idCol, col("keep_prob"))
      .drop("keep_prob")
  }

  /** Quota-based corpus mixing: exactly `min(quota, |stratum|)` rows
    * from each listed stratum, chosen in hash order (id tiebreak) —
    * the domain-mixture step of corpus assembly ("40% web, 30% code,
    * …" expressed as absolute per-source document quotas). Strata
    * without a quota are dropped BEFORE the shuffle, so the window
    * only ever sorts rows that can be selected; everything else is
    * one window over the stratum key, same shape as
    * [[stratifiedSample]].
    */
  def quotaMix(df: DataFrame, strataCol: String, idCol: String,
      quotas: Seq[(String, Long)]): DataFrame = {
    require(quotas.nonEmpty, "need at least one stratum quota")
    require(quotas.forall(_._2 > 0), s"quotas must be positive: $quotas")
    val qmap = map(quotas.flatMap { case (s, q) => Seq(lit(s), lit(q)) }: _*)
    val ord = Window.partitionBy(col(strataCol))
      .orderBy(hashOrder(col(idCol)), col(idCol))
    df.filter(col(strataCol).isin(quotas.map(_._1): _*))
      .withColumn("__rn", row_number().over(ord))
      .filter(col("__rn") <= element_at(qmap, col(strataCol)))
      .drop("__rn")
  }
}
