package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry query.
  * Usage: runMain graft.tools.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = DevSession.local(8)
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println("=== FORMATTED PLAN: " + name + " ===")
    df.explain("formatted")
    println("=== END PLAN ===")
    spark.stop()
  }
}
