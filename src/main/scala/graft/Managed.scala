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

  /** A Managed over a frame derived from this one, sharing its
    * caches — for wrappers that post-process the pipeline's result
    * (e.g. an anti-join against the pair list) before handing it to
    * the caller's lifecycle.
    */
  def mapDf(f: DataFrame => DataFrame): Managed =
    new Managed(f(df), cached)

  /** One-shot convenience lifecycle for the plain (non-Managed)
    * wrappers: returns `df` with an `observe()` marker attached and a
    * listener that calls [[release]] as soon as the first action over
    * the returned frame completes — the same pattern as
    * `Curation.curateObserved`'s token-artifact lifecycle. The
    * observation NAME identifies the execution in
    * `qe.observedMetrics` (public, plan-shape-independent; the
    * metrics node does not change rows). One-shot semantics: a second
    * action over the frame re-derives the pipeline uncached —
    * multi-action callers use the `...Managed` variant instead.
    */
  def autoReleased(): DataFrame = {
    val spark = df.sparkSession
    val name = "graft_release_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val out = df.observe(name,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)))
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      private def maybeRelease(
          qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        if (qe.observedMetrics.contains(name)) {
          release()
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    out
  }
}
