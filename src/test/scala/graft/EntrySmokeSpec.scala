package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows on the
  * sf0.001 flagship — the exact check the round driver runs before
  * anything else. Kept as a spec so `sbt test` exercises the entry
  * path every run instead of only the `queries` map.
  */
class EntrySmokeSpec extends SparkSpec {
  test("entry returns rows on the sf0.001 flagship (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
