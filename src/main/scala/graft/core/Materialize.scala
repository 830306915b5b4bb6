package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Lifecycle helper for `localCheckpoint`-materialized frames.
  *
  * `localCheckpoint` truncates lineage and parks the data as storage
  * blocks that ContextCleaner only reclaims after the wrapping RDD is
  * garbage-collected — in a long-lived session that runs many queries,
  * superseded checkpoints accumulate and degrade every later job (the
  * round-2 bench measured 3-10x inflation on trailing queries). Iterative
  * operators must release each round's blocks once the next round is
  * materialized.
  */
object Materialize {

  /** Free the storage blocks behind a `localCheckpoint`ed frame.
    *
    * ONLY call this when `df` (and every frame derived from it) will
    * never be evaluated again: local checkpoints have no lineage to
    * recompute from, so a released frame is unrecoverable by design.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: LogicalRDD if lr.rdd.getStorageLevel != StorageLevel.NONE =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
