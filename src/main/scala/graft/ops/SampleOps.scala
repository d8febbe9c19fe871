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
