package graft.tools

import org.apache.spark.sql.SparkSession

/** One session builder for the dev tools (Profile/Explain) so their
  * config can't drift from each other — the same knobs the driver
  * mains use (nanosAsLong, small-file splits, extensions), sized by
  * the caller.
  */
object DevSession {
  def local(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
