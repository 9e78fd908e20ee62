package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` call a V1 streaming Source needs: batch
  * DataFrames returned from `Source.getBatch` must carry the
  * `isStreaming` flag or the incremental planner rejects them —
  * exactly what Spark's own FileStreamSource does via
  * `internalCreateDataFrame(..., isStreaming = true)`, reachable only
  * from inside the `org.apache.spark.sql` namespace (the same shim
  * pattern early external connectors used).
  */
object GraftSqlBridge {
  def streamingDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** Wrap a custom LogicalPlan (e.g. graft.plans.BucketedTableScan) as
    * a DataFrame — `Dataset.ofRows` is `private[sql]`, same shim
    * rationale as above.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a catalyst Expression as a user-facing Column —
    * `ExpressionUtils.column` is `private[sql]`; the DML lowering rule
    * (graft.sql.GraftDmlRules) uses it to carry rebound UPDATE/MERGE
    * clause expressions into DataFrame operations.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
