package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions path: a session built with
  * spark.sql.extensions=graft.plans.GraftExtensions gets every
  * native function in SQL with no imperative register call, and the
  * library (SparkEntry queries) runs unmodified on it.
  */
class GraftExtensionsSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {

  // separate session on purpose: proves injection, not register().
  // getOrCreate() would hand back the suite-shared session (configs
  // silently ignored), so the default is cleared first and restored
  // after — the underlying SparkContext is reused either way.
  private var saved: Option[SparkSession] = None

  lazy val spark: SparkSession = {
    saved = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // spark.sql.extensions is STATIC — ignored when another suite's
    // SparkContext already exists — but withExtensions applies at
    // session construction unconditionally
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  override def afterAll(): Unit = {
    saved.foreach { prev =>
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
    super.afterAll()
  }

  test("injected functions are callable from plain SQL") {
    val r = spark.sql(
      """SELECT
         graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
         graft_minhash(array('a','b','c'), 2, 4) AS mh,
         graft_simhash(array('x','y')) AS sh,
         graft_srp_bucket(array(0.5d, -0.5d), 4) AS b""").head
    assert(r.getDouble(0) === 1.0)
    assert(r.getSeq[Long](1).length === 4)
    assert(r.getSeq[Long](2).length === 4)
    assert(r.getLong(3) >= 0L && r.getLong(3) <= 15L)
  }

  test("library queries run on an extensions-built session") {
    val df = graft.SparkEntry.queries("q_minhash_neardup")(
      spark, "/root/testdata/sf0.001")
    assert(df.count() > 0)
  }
}
