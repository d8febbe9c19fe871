package graft

class SessionCachesSpec extends SparkSpec {

  test("session-end eviction drops every cache entry for that session only") {
    // two sessions over the shared test context: caches must be
    // evicted per-session, not globally
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.orders(spark, sfDir).count()
    Tables.orders(s2, sfDir).count()
    Tables.customer(s2, sfDir).count()
    assert(SessionCaches.liveEntriesFor(s2) >= 2)
    val mainBefore = SessionCaches.liveEntriesFor(spark)
    assert(mainBefore >= 1)
    // what the ApplicationEnd listener runs (the shared test context
    // cannot be stopped mid-suite, so invoke the eviction directly)
    SessionCaches.evictNow(s2)
    assert(SessionCaches.liveEntriesFor(s2) === 0)
    assert(SessionCaches.liveEntriesFor(spark) === mainBefore)
    // the evicted session re-hooks and re-populates cleanly
    Tables.orders(s2, sfDir).count()
    assert(SessionCaches.liveEntriesFor(s2) === 1)
    SessionCaches.evictNow(s2)
  }
}
