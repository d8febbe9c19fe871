package graft

import org.apache.spark.sql.DataFrame

/** Frame-lifecycle helpers shared by the iterative operators and the
  * streaming batch cores.
  */
private[graft] object Frames {

  /** Free an eager localCheckpoint's storage blocks. `Dataset.unpersist`
    * only uncaches CacheManager entries — the checkpointed RDD's
    * MEMORY_AND_DISK blocks are invisible to it and otherwise linger
    * until the ContextCleaner happens to GC the RDD, which on a long
    * iterative peel (k-core, PageRank rounds) or a long-running
    * streaming sink means per-round/per-batch storage accumulates.
    * The checkpointed RDD sits behind the plan's LogicalRDD leaf;
    * unpersist THAT.
    *
    * ONLY call on a frame whose data is no longer reachable from any
    * live plan: a localCheckpoint is non-reliable, so freeing its
    * blocks while a dependent frame still needs them loses the data
    * (there is no lineage left to recompute from).
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Broadcast hint for a tombstone-id join side, gated by the
    * tombstone DIRECTORY's on-disk size — one recursive listing call,
    * no extra Spark job. Tombstone volume is unbounded in the
    * right-to-be-forgotten scenario the delete sinks exist for: after
    * years of erasure a forced `broadcast()` hint would bypass
    * Spark's own size check and OOM executors, so past the budget the
    * hint is dropped and the planner/AQE picks a shuffle join (the
    * byte-budget-with-fallback convention of the dedup fast paths).
    * `ids` may be a filtered subset of the directory's rows — the
    * directory size is then a safe upper bound. Budget override (for
    * specs and ops): `spark.graft.tombstoneBroadcastBudget` in bytes.
    */
  def hintTombstones(ids: DataFrame, dir: String): DataFrame = {
    val spark = ids.sparkSession
    val budget = spark.conf
      .getOption("spark.graft.tombstoneBroadcastBudget")
      .map(_.toLong).getOrElse(64L << 20)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes =
      try fs.getContentSummary(p).getLength
      catch { case _: java.io.FileNotFoundException => 0L }
    if (bytes <= budget) org.apache.spark.sql.functions.broadcast(ids)
    else ids
  }
}
