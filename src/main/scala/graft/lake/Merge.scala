package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pure MERGE resolution logic (L1, SURVEY.md §2.9) — shared by
  * ManifestTable.merge and the streaming foreachBatch sink (T5).
  *
  * Semantics (matched by the reference's CDC feed,
  * `/root/reference/datasets/orders_2024-06-06-Updated.csv`): keyed
  * upsert, source wins on match — a matched source row fully replaces
  * the target row, NULLs included (standard MERGE "UPDATE SET *";
  * correction feeds carry full rows, not sparse patches). Unmatched
  * source rows insert, unmatched target rows persist. Tombstone
  * deletes (WHEN MATCHED AND s._deleted THEN DELETE) via [[applyCdc]].
  */
object Merge {

  /** Full-outer keyed upsert; schemas must match and `updates` must
    * carry at most ONE row per key (a feed with several versions of a
    * key would fan out the join — compact it first with
    * [[latestPerKey]]). One shuffle on the key — at scale both sides
    * hash-partition; no broadcast assumption (the updates side of a
    * CDC feed can be arbitrarily large).
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    // align by NAME: a partitioned table reads back with the partition
    // column moved to the end, so positional alignment would corrupt
    require(base.columns.toSet == updates.columns.toSet,
      s"schema mismatch: ${base.columns.toSeq} vs ${updates.columns.toSeq}")
    val cols = base.columns.toSeq
    // explicit presence marker: testing source-key nullability would
    // misread a legitimately-NULL-keyed source row (matched null-safely
    // by the <=> join) as "no source row" and silently drop its update
    val s0 = updates.select(cols.map(col): _*)
      .withColumn("_s_present", lit(true))
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val sourcePresent = coalesce(col(s"s._s_present"), lit(false))
    base.as("t").join(s0.as("s"), cond, "full_outer")
      .select(cols.map { c =>
        when(sourcePresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      }: _*)
  }

  /** Default tombstone column name for [[applyCdc]] feeds. */
  val DeleteCol = "_deleted"

  /** CDC MERGE with delete tombstones — the Delta/Iceberg three-clause
    * form in ONE full-outer shuffle:
    *
    *   WHEN MATCHED AND s.`deleteCol`     THEN DELETE
    *   WHEN MATCHED                       THEN UPDATE SET *
    *   WHEN NOT MATCHED AND NOT s.`deleteCol` THEN INSERT *
    *
    * `updates` = base schema + a boolean `deleteCol` (NULL = false).
    * A tombstone for an absent key is a no-op (idempotent re-apply: a
    * feed applied twice deletes/updates/inserts to the same state).
    */
  def applyCdc(base: DataFrame, updates: DataFrame,
      keys: Seq[String], deleteCol: String = DeleteCol): DataFrame = {
    require(base.columns.toSet + deleteCol == updates.columns.toSet,
      s"updates must be base schema + $deleteCol: " +
        s"${base.columns.toSeq} vs ${updates.columns.toSeq}")
    val cols = base.columns.toSeq
    // same presence-marker rationale as [[upsert]]: NULL source keys
    // are legal and must still update/delete their null-safe match
    val s0 = updates.select((cols :+ deleteCol).map(col): _*)
      .withColumn("_s_present", lit(true))
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val sourcePresent = coalesce(col(s"s._s_present"), lit(false))
    val isDelete = coalesce(col(s"s.$deleteCol"), lit(false))
    base.as("t").join(s0.as("s"), cond, "full_outer")
      .filter(!(sourcePresent && isDelete)) // drop matched + tombstoned keys
      .select(cols.map { c =>
        when(sourcePresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      }: _*)
  }

  /** Rows of `updates` that would actually change the table: new keys
    * plus rows differing in any column from their base counterpart.
    * Drives the merge no-op fast path (idempotent re-apply) and
    * touched-partition pruning.
    */
  def effectiveChanges(base: DataFrame, updates: DataFrame): DataFrame =
    updates.exceptAll(base.select(updates.columns.toIndexedSeq.map(col): _*))

  /** CDC feed compaction: keep only the newest row per key, ordered
    * by `orderCol` (event time / sequence number), ties broken
    * arbitrarily-but-deterministically by the remaining columns'
    * hash. Run this before [[upsert]] when a feed may carry several
    * versions of one key (always true for streaming micro-batches
    * that buffer more than one change).
    */
  def latestPerKey(updates: DataFrame, keys: Seq[String],
      orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc,
        xxhash64(struct(updates.columns.toIndexedSeq.map(col): _*)).asc)
    updates.withColumn("_graft_rn", row_number().over(w))
      .filter(col("_graft_rn") === 1).drop("_graft_rn")
  }
}
