package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-join salting (SURVEY.md §4 / 100-TB design rules): when one
  * join key dominates (a hot product, a null-heavy FK), hash joins put
  * the whole hot key on one task. Salting splits the skewed (large)
  * side across `factor` sub-keys and replicates the other side once
  * per sub-key — turning one straggler into `factor` even tasks.
  *
  * AQE's skew-join split handles sort-merge joins automatically; this
  * utility covers the cases AQE can't see (aggregations over a skewed
  * key, broadcast-ineligible skewed dims, pre-Spark-3 parity), and
  * makes the technique explicit and testable.
  */
object Salting {

  val SaltCol = "_graft_salt"

  /** Add a salt 0..factor-1 to the skewed side. The spread mixes a
    * per-row ordinal into the row hash: a content-only hash would give
    * FULLY-DUPLICATE rows (a common hot-key shape — repeated identical
    * events) the same salt and never split the straggler. The ordinal
    * makes salt values run-dependent, which is fine — salting has no
    * determinism contract, only row-preservation (asserted in
    * ScaleOpsSpec).
    */
  def saltLarge(df: DataFrame, factor: Int): DataFrame =
    df.withColumn(SaltCol,
      pmod(xxhash64(struct(df.columns.map(col): _*),
        monotonically_increasing_id()), lit(factor.toLong)).cast("int"))

  /** Replicate the small side once per salt value. */
  def replicateSmall(df: DataFrame, factor: Int): DataFrame =
    df.withColumn(SaltCol,
      explode(array((0 until factor).map(lit): _*)))

  /** Salted inner equi-join on `keys`: equivalent rows to a plain
    * join, but the skewed side's hot keys spread over `factor` tasks.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int): DataFrame =
    saltLarge(large, factor)
      .join(replicateSmall(small, factor), keys :+ SaltCol)
      .drop(SaltCol)

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (keys, salt), then final aggregate on keys. `partial` maps a
    * grouped DataFrame to its partial aggregate; `merge` combines
    * partials. For algebraic aggregates (sum/count/min/max) partial
    * and merge are the same shape.
    */
  def skewSafeCount(df: DataFrame, keys: Seq[String], factor: Int): DataFrame =
    saltLarge(df, factor)
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(count(lit(1)).as("_partial_n"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial_n").as("n"))
}
