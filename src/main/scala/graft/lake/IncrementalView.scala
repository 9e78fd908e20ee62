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
    // SUM NULL-ness: a side's sum is NULL when it saw no non-null
    // values — the combined sum must stay NULL when BOTH sides are
    // NULL (coalescing to 0 would rewrite an all-NULL group's SUM
    // from NULL to 0 and diverge from a recompute). Known caveat,
    // same class as MIN/MAX: a delete that removes a group's last
    // non-null values leaves 0 here where a recompute gives NULL —
    // exact NULL tracking under deletes needs a per-measure non-null
    // count, which callers needing it should add as another sumCol.
    def nullSafeAdd(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      when(x.isNull && y.isNull, lit(null))
        .otherwise(coalesce(x, lit(0)) + coalesce(y, lit(0)))
    val outCols =
      groupKeys.map(k => coalesce(col(s"a.$k"), col(s"d.$k")).as(k)) ++
        sumCols.map(c => nullSafeAdd(col(s"a.$c"), col(s"d._d_$c")).as(c)) :+
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

  /** The base-table version a materialized view currently reflects —
    * recorded as a version tag written before each view commit, so the
    * pair (view version, as-of version) survives crash-replay intact.
    */
  val AsOfTag = "asof"

  def viewAsOf(view: ManifestTable): Int = {
    val v = view.latestVersion.getOrElse(
      throw new IllegalStateException("view has no versions — materialize first"))
    view.versionTag(v, AsOfTag).map(_.toInt).getOrElse(
      throw new IllegalStateException(
        s"view v$v has no '$AsOfTag' tag — materialize via IncrementalView.materialize"))
  }

  /** Bootstrap a view: full recompute of `viewOf(table.read())` stamped
    * with the table version it reflects.
    */
  def materialize(table: ManifestTable, view: ManifestTable,
      viewOf: DataFrame => DataFrame): Int = {
    val asOf = table.latestVersion.getOrElse(
      throw new IllegalStateException("base table has no versions"))
    val nextV = view.latestVersion.getOrElse(-1) + 1
    view.putVersionTag(nextV, AsOfTag, asOf.toString)
    view.write(viewOf(table.read(Some(asOf))), "overwrite")
  }

  /** Catch the view up to the table's latest version, reading the
    * refresh RANGE from the view's own durable as-of tag — never from
    * state captured around the caller's merge. This is what makes the
    * streaming sink crash-safe: if a job dies after the merge commits
    * but before the view write, the replayed batch's merge is a no-op,
    * yet the as-of tag still points at the pre-crash version, so the
    * missed delta is applied then. Idempotent: already-current views
    * commit nothing.
    */
  def refreshToLatest(table: ManifestTable, view: ManifestTable,
      rowKeys: Seq[String], groupKeys: Seq[String],
      sumCols: Seq[String], countCol: String = "n"): Int = {
    val vFrom = viewAsOf(view)
    val vTo = table.latestVersion.get
    if (vTo <= vFrom) return view.latestVersion.get
    val next = refresh(table, vFrom, vTo, view.read(), rowKeys, groupKeys,
      sumCols, countCol)
    val nextV = view.latestVersion.get + 1
    view.putVersionTag(nextV, AsOfTag, vTo.toString)
    view.write(next, "overwrite")
  }
}
