package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Releases the storage of a superseded `localCheckpoint`'ed state
  * generation.
  *
  * `Dataset.unpersist()` does NOT do this: in Spark 4.1.2 it only calls
  * `CacheManager.uncacheQuery`, and `localCheckpoint` persists the
  * UNDERLYING RDD directly — the checkpoint blocks are never registered
  * with the CacheManager, so the Dataset-level call is a no-op on them
  * and cleanup stays GC/ContextCleaner-driven (one dead full-state
  * generation per micro-batch until a collection happens to run). The
  * fix is to unpersist the checkpointed RDD itself: an eagerly
  * checkpointed Dataset's analyzed plan IS a [[LogicalRDD]] holding it.
  *
  * Dropping the parent generation is safe once its replacement has
  * materialized (our stores checkpoint eagerly): a local checkpoint
  * cannot recompute lost partitions by design, and the superseded
  * generation is no longer reachable from any live plan.
  */
private[streaming] object CheckpointRelease {

  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst { case l: LogicalRDD => l.rdd }
      .foreach { r => r.unpersist(blocking = false); () }
}
