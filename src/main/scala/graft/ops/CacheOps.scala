package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S13: the reference's TTL read-through point cache
  * (services/document/app/cache.py:37-79: 300 s TTL, GET serves the
  * cached doc, updates invalidate) re-expressed for a batch/cluster
  * engine as a KEYED SNAPSHOT — a small, broadcastable dim carrying
  * TTL metadata columns.
  *
  * Shape: `snapshot()` stamps rows with cached_at/expires_at from an
  * INJECTED clock (never wall time — deterministic, replayable);
  * `readThrough()` serves a point lookup from the snapshot iff the
  * key is present and unexpired, and only otherwise evaluates the
  * base relation; `invalidate()` drops keys after a merge, the
  * cache.py delete-on-update contract.
  *
  * Scale notes: a point cache is by definition tiny relative to its
  * base table — the snapshot persists/broadcasts whole, the hit
  * check is a filter on a cached frame (no base-table scan: the spec
  * pins this by serving hits against an unreadable base), and the
  * miss path is the same pushed-down point lookup S2 uses.
  */
object CacheOps {

  val CachedAtCol = "__cached_at_ms"
  val ExpiresAtCol = "__expires_at_ms"

  /** Stamp a keyed row set as a cache snapshot valid for `ttl` from
    * `clock`. Rows are persisted (a cache that rescans its source on
    * every probe isn't a cache).
    */
  def snapshot(rows: DataFrame, clock: java.time.Instant,
      ttl: java.time.Duration): DataFrame =
    rows
      .withColumn(CachedAtCol, lit(clock.toEpochMilli))
      .withColumn(ExpiresAtCol, lit(clock.plus(ttl).toEpochMilli))
      .persist()

  /** The unexpired slice of a snapshot as of `now`. */
  def fresh(snap: DataFrame, now: java.time.Instant): DataFrame =
    snap.filter(col(ExpiresAtCol) > lit(now.toEpochMilli))

  /** Read-through point lookup: snapshot hit iff the key exists and
    * is unexpired as of `now`; otherwise the by-name `base` relation
    * is evaluated (and only then — a hit never touches it). Both
    * paths return the base schema; metadata columns never leak.
    */
  def readThrough(snap: DataFrame, base: => DataFrame, keyCol: String,
      key: Column, now: java.time.Instant): DataFrame = {
    val hit = fresh(snap, now).filter(col(keyCol) === key)
    if (!hit.isEmpty) hit.drop(CachedAtCol, ExpiresAtCol)
    else base.filter(col(keyCol) === key)
  }

  /** Drop updated keys from the snapshot — the invalidate-on-update
    * half of the contract (cache.py delete on PATCH). Null-safe so a
    * null key in the update set can't silently survive.
    */
  def invalidate(snap: DataFrame, updatedKeys: DataFrame,
      keyCol: String): DataFrame =
    snap.join(updatedKeys.select(col(keyCol).as("__inv_key")),
      col(keyCol) <=> col("__inv_key"), "left_anti")
}
