package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for keyed SUM/COUNT
  * aggregates, driven by the change data feed (L8,
  * [[ManifestTable.changesBetween]]).
  *
  * A gold rollup over a 100 TB table must not be recomputed by
  * rescanning the table on every refresh; the standard algebra
  * (self-maintainable views over insert/delete/update deltas) applies
  * each changed row as a signed contribution: inserts and update
  * post-images add, deletes and update pre-images subtract. Group-key
  * moves need no special case — the pre-image subtracts from the old
  * group and the post-image adds to the new one. Cost is
  * O(delta + touched groups), never O(table).
  *
  * Exactness: with DECIMAL-typed measure columns the maintained view is
  * bit-identical to a full recompute (decimal addition is associative).
  * Double measures would drift by FP reordering — route money through
  * DECIMAL (Q's discipline) before maintaining a view over it.
  * SUM/COUNT (and AVG = SUM/COUNT) are self-maintainable; MIN/MAX are
  * not under deletes (a deleted extremum needs a rescan of its group) —
  * that classic limitation is the caller's to respect.
  */
object IncrementalView {

  /** Apply a change feed to a keyed aggregate of shape
    * `groupKeys ++ sumCols ++ countCol`. `cdf` is L8 output: full rows
    * plus `_change_type` ∈ insert | delete | update_preimage |
    * update_postimage. Groups whose row count reaches zero are dropped.
    */
  def applyDelta(agg: DataFrame, cdf: DataFrame, groupKeys: Seq[String],
      sumCols: Seq[String], countCol: String = "n"): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1)).otherwise(lit(-1))
    val dAggs =
      sum(sign.cast("long")).as(s"_d_$countCol") +:
        sumCols.map(c => sum(col(c) * sign).as(s"_d_$c"))
    val deltas = cdf.groupBy(groupKeys.map(col): _*)
      .agg(dAggs.head, dAggs.tail: _*)
    // full outer on NULL-SAFE key equality: a NULL group key is a legal
    // aggregation group, and plain `=` would never match it between the
    // view and the delta — the null group would appear twice instead of
    // merging. Feed may touch groups absent from the view (new groups)
    // and the view keeps groups the feed never mentions.
    val cond = groupKeys.map(k => col(s"a.$k") <=> col(s"d.$k")).reduce(_ && _)
    val joined = agg.as("a").join(deltas.as("d"), cond, "full_outer")
    val outCols =
      groupKeys.map(k => coalesce(col(s"a.$k"), col(s"d.$k")).as(k)) ++
        sumCols.map(c =>
          (coalesce(col(s"a.$c"), lit(0)) + coalesce(col(s"d._d_$c"), lit(0))).as(c)) :+
        (coalesce(col(s"a.$countCol"), lit(0L)) +
          coalesce(col(s"d._d_$countCol"), lit(0L))).as(countCol)
    joined.select(outCols: _*).filter(col(countCol) > 0)
  }

  /** Refresh a view from the table's committed versions: read the L8
    * diff between the version the view was built at and the target
    * version, and apply it. `rowKeys` are the TABLE's row identity (the
    * CDF join keys); `groupKeys` are the VIEW's grouping columns.
    */
  def refresh(table: ManifestTable, vFrom: Int, vTo: Int,
      agg: DataFrame, rowKeys: Seq[String], groupKeys: Seq[String],
      sumCols: Seq[String], countCol: String = "n"): DataFrame =
    applyDelta(agg, table.changesBetween(vFrom, vTo, rowKeys),
      groupKeys, sumCols, countCol)
}
