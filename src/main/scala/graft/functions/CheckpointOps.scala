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

  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The persisted RDD(s) behind a localCheckpoint'd frame. */
  def rdds(df: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }

  /** Release the checkpoint blocks behind `df` (non-blocking). Safe
    * only once nothing will read `df` again: the checkpoint's lineage
    * is truncated, so the frame is unrecomputable afterwards. Never
    * call on a frame that escapes to the caller.
    *
    * PRECONDITION: `df` must be a direct localCheckpoint or a thin
    * projection over exactly ONE checkpoint. This releases EVERY
    * LogicalRDD leaf in the plan — on a composite frame (say, a join
    * of a superseded checkpoint with some still-live checkpointed
    * input) it would silently unpersist the live input too. All
    * engine call sites keep that discipline; a multi-leaf call logs a
    * warning so a future composite-frame mistake surfaces in the
    * driver log instead of as a mystery recompute failure.
    */
  def release(df: Dataset[_]): Unit = {
    val rs = rdds(df)
    if (rs.length > 1) logger.warn(
      s"CheckpointOps.release on a plan with ${rs.length} LogicalRDD " +
        "leaves — releasing ALL of them; if any leaf is still live " +
        "elsewhere this is a caller bug (see scaladoc precondition)")
    rs.foreach(_.unpersist(blocking = false))
  }
}
