package graft

import org.apache.spark.sql.DataFrame

/** A lazily-computed result whose plan reads internally persisted
  * state (e.g. the signature cache inside the near-duplicate
  * pipelines). The cache makes the multi-branch plan single-pass but
  * outlives the query unless released — long-lived sessions must call
  * `release()` (idempotent) after the final action over `df`, or use
  * `apply` to scope an action with release-in-finally.
  */
final class Managed(val df: DataFrame, cached: Seq[DataFrame]) {
  @volatile private var released = false

  def release(): Unit = synchronized {
    if (!released) {
      cached.foreach(_.unpersist(false))
      released = true
    }
  }

  /** `managed { d => d.collect() }` — runs the action, then releases
    * the internal cache even if the action throws.
    */
  def apply[T](f: DataFrame => T): T =
    try f(df) finally release()
}
