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
      pmod(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*),
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

  /** Hot-key-split join (the "skew hint" pattern Databricks/Trino
    * apply, made explicit): MEASURE the key histogram on the large
    * side first (one partial-aggregated count — the pr2_skew_report
    * pass), then route rows of the ≤`maxHotKeys` keys above
    * `hotThreshold` through a BROADCAST join (their matching small-
    * side rows are by construction few — they're join keys, and the
    * small side is the dimension) and everything else through the
    * normal shuffle join. Union of the two legs ≡ the plain join,
    * row-for-row.
    *
    * Where [[saltedJoin]] pays `factor`× replication of the ENTIRE
    * small side, the split pays replication only for the hot keys'
    * rows (broadcast), leaving the well-distributed 99.9% untouched —
    * at 100 TB this is the difference between a straggler fix and a
    * 16× shuffle-volume regression. AQE's skew split covers sort-merge
    * legs after the fact; the explicit split also covers hash
    * aggregation feeding joins and lets the hot set come from STATS
    * (a prior ANALYZE or Misra-Gries pass) instead of a runtime probe.
    *
    * The hot-key scan adds one pass over the large side's KEY COLUMNS
    * only (column-pruned, map-side combined, top-`maxHotKeys` driver
    * collect) — the same cost pr2_skew_report already budgets.
    */
  def hotKeySplitJoin(large: DataFrame, small: DataFrame,
      keys: Seq[String], hotThreshold: Long = 100000L,
      maxHotKeys: Int = 100): DataFrame = {
    require(keys.nonEmpty, "hotKeySplitJoin: empty key list")
    val kc = keys.map(col)
    val hot = large.groupBy(kc: _*)
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotThreshold)
      .orderBy(col("_n").desc)
      .limit(maxHotKeys)
      .drop("_n")
      .localCheckpoint(true) // bounded: ≤ maxHotKeys rows
    if (hot.isEmpty) return large.join(small, keys)
    // NULL-safe membership: join keys never match on NULL anyway, so
    // a plain inner semi/anti split on the keys is row-preserving.
    val largeHot = large.join(broadcast(hot), keys, "left_semi")
    val largeCold = large.join(broadcast(hot), keys, "left_anti")
    val smallHot = small.join(broadcast(hot), keys, "left_semi")
    largeHot.join(broadcast(smallHot), keys)
      .unionByName(largeCold.join(small, keys))
  }
}
