package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped cache registry: per-(session, key) caches register
  * here and get their entries evicted when the owning session's
  * SparkContext ends, so a long-lived JVM (a serving process cycling
  * sessions) never pins resolved relations or checkpoint blocks for
  * stopped sessions. Eviction is listener-driven (application end),
  * the mechanism Spark itself uses for state cleanup.
  */
object SessionCaches {
  private val maps =
    new java.util.concurrent.CopyOnWriteArrayList[ConcurrentHashMap[(SparkSession, String), _]]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register a (session, key)-keyed cache for end-of-session eviction. */
  def register(map: ConcurrentHashMap[(SparkSession, String), _]): Unit =
    maps.add(map)

  /** Idempotently attach the eviction listener for `s`. Call on every
    * cache insert — first call per session wins, the rest are a
    * set-membership check.
    */
  def ensureHook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evictNow(s)
      })
    }

  /** Drop every cached entry owned by `s` — the listener's work,
    * callable directly (and from specs, where stopping the shared
    * test context is not an option).
    */
  private[graft] def evictNow(s: SparkSession): Unit = {
    maps.forEach { m => m.keySet.removeIf(_._1 eq s) }
    hooked.remove(s)
  }

  /** Test hook: number of cached entries held for `s` across all
    * registered caches.
    */
  private[graft] def liveEntriesFor(s: SparkSession): Int = {
    var n = 0
    maps.forEach { m =>
      m.keySet.forEach { k => if (k._1 eq s) n += 1 }
    }
    n
  }
}
