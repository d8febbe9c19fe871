package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handles moderate skew
  * at runtime; these are the explicit forms for the degenerate cases
  * a 100 TB pipeline actually hits (one viral document id holding 1%
  * of all view events, a null-ish default key, a boilerplate dedup
  * bucket).
  */
object Skew {

  /** Salted two-phase aggregation: a hot grouping key is spread over
    * `saltFactor` sub-keys (phase 1), then sub-aggregates combine
    * (phase 2). Useful when a single key's partial state is itself
    * huge (e.g. large collect-style aggs) — plain count/sum already
    * map-side combine, so reach for this only when one reducer key
    * dominates the shuffle.
    *
    * The salt must be a deterministic function of OTHER columns so
    * results stay reproducible; pass e.g. `pmod(hash(col("user_id")),
    * lit(saltFactor))`.
    */
  def saltedCount(df: DataFrame, key: Column, salt: Column): DataFrame =
    df.groupBy(key.as("key"), salt.as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("n"))

  /** Salted equi-join: the (small) build side is replicated
    * `saltFactor` ways; the probe side picks a deterministic salt per
    * row. Each hot join key fans across saltFactor reducers instead
    * of one. Result is row-identical to the unsalted join.
    *
    * The salt is a hash of the fact row's own columns, so a task
    * retry or AQE re-plan re-derives the SAME salt per row — bit-
    * stable shuffles, unlike id()-based salts which renumber on
    * replay. Fully identical rows share a salt; they spread anyway
    * because the hash keys on every column, not just the hot key.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"))
      .drop("__salt")
  }
}
