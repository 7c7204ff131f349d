package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Freeing the blocks of a superseded `localCheckpoint()`.
  *
  * `Dataset.unpersist` is a CacheManager operation — it drops
  * plan-cache entries (`df.cache()`), and does NOTHING for a local
  * checkpoint, whose blocks are persisted on the materialized RDD
  * itself (verified empirically on Spark 4.1: persistent-RDD count is
  * unchanged by `Dataset.unpersist` after `localCheckpoint()`). The
  * blocks otherwise live until the driver GCs the RDD object and
  * ContextCleaner notices — unbounded retained generations inside an
  * iterative loop. The checkpointed RDD is reachable as the
  * `LogicalRDD` leaf of the checkpointed Dataset's plan; unpersisting
  * THAT frees the blocks now.
  *
  * Only ever call this on a SUPERSEDED frame: a local checkpoint has
  * no lineage to recompute from, so a freed one is gone (any later
  * action on it fails). The iterative operators (d09's star loop,
  * t34's merge loop) call it on round N−1 only after round N is
  * materialized.
  */
object CheckpointOps {

  /** Unpersist the RDD blocks behind a `localCheckpoint()`ed
    * DataFrame. No-op on plans without a LogicalRDD leaf. */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
