package graft.functions

import org.apache.spark.sql.Dataset

/** localCheckpoint lifecycle helpers. `Dataset.unpersist()` is a
  * silent NO-OP for a localCheckpoint'd frame — its blocks belong to
  * the underlying RDD, not the cache manager — so iterative operators
  * that re-checkpoint per round must release superseded checkpoints
  * at the RDD level or they accumulate storage memory until the
  * context cleaner happens to collect them (at 100 TB a per-round
  * rank/label table pinned per iteration is an executor-memory
  * time bomb). The RDDs are taken DIRECTLY from the checkpoint's own
  * plan (its `LogicalRDD` leaves), never from a global
  * persistent-RDD-id diff, so a concurrent job's cached blocks can
  * never be touched by mistake.
  */
object CheckpointOps {

  /** The persisted RDD(s) behind a localCheckpoint'd frame. */
  def rdds(df: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Release the checkpoint blocks behind `df` (non-blocking). Safe
    * only once nothing will read `df` again: the checkpoint's lineage
    * is truncated, so the frame is unrecomputable afterwards. Never
    * call on a frame that escapes to the caller.
    */
  def release(df: Dataset[_]): Unit =
    rdds(df).foreach(_.unpersist(blocking = false))
}
