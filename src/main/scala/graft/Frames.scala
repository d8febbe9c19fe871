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
}
