package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed trailing-N-row window aggregate — the scalable
  * replacement for `Window.partitionBy(lowCardKey).orderBy(ord)
  * .rowsBetween(-n, -1)` over raw rows (one task per key: at 100 TB
  * the dominant event type is most of the table sorted in a single
  * task).
  *
  * A trailing frame of N rows needs only N rows of carry-in across any
  * split point, so the plan is:
  *
  *  1. range-bucket each key's rows on a monotone numeric image of the
  *     order (e.g. epoch seconds); equal bucket values stay together,
  *     so bucket order is consistent with row order;
  *  2. greedy-merge adjacent buckets (driver-side, over the tiny
  *     per-bucket count frame) so every group except possibly a key's
  *     only group holds ≥ N rows — the invariant that makes one
  *     group's tail a sufficient carry for the next group;
  *  3. tag each group's last N rows as carry rows for the NEXT group,
  *     union them in, run the trailing window partitioned by
  *     (key, group) — many bounded tasks — and drop the carries.
  *
  * The result is row-identical to the single-window form: a row's
  * trailing N predecessors are either in its own group or among the
  * previous group's ≥ N carried tail rows.
  *
  * Driver state: the per-(key, bucket) count frame — at most
  * |keys| × targetBuckets rows (enforced ≤ 1e6). The operator exists
  * for LOW-cardinality keys; high-cardinality keys don't need it.
  */
object BucketedRolling {

  /** Append `outCol` = agg over the trailing `n` rows (exclusive of
    * the current row) per `partCols` in `(rangeCol, tieCols)` order.
    *
    * @param rangeCol numeric column, monotone non-decreasing in the
    *                 intended row order (ties allowed — tied rows
    *                 share a bucket); used for both range bucketing
    *                 and the primary sort key
    * @param tieCols  remaining order columns; (rangeCol, tieCols) must
    *                 totally order rows within a key
    * @param agg      window aggregate over the value column, e.g.
    *                 `max(_)` / `min(_)` / `sum(_)`
    * @param maxDriverRows cap on the driver-side (key × bucket) count
    *                 frame — checked with a limit probe before the
    *                 collect, so exceeding it throws rather than OOMs
    */
  def trailing(
      df: DataFrame,
      partCols: Seq[String],
      rangeCol: Column,
      tieCols: Seq[String],
      valCol: String,
      n: Int,
      agg: Column => Column,
      outCol: String,
      targetBuckets: Int = 64,
      maxDriverRows: Int = 1000000): DataFrame = {
    require(n >= 1, s"trailing frame must be at least 1 row, got $n")
    val part = partCols.map(graft.functions.Cols.quoted)
    // The operator executes its lineage several times (range probe,
    // count collect, final window), and correctness REQUIRES every
    // pass to see the same rows as the collected (key,bucket)->group
    // map. Two regimes:
    //
    //  - DETERMINISTIC input (the common case — ts3 reads a table
    //    scan): re-execution is consistent by construction, so the
    //    lineage simply runs per pass (2 probe passes + 2 reads in
    //    the final union job — the honest cost of not pinning; a
    //    caller whose upstream lineage is expensive can persist it
    //    BEFORE calling and keep control of the release). No storage
    //    pinned, no lineage truncation — an executor loss recomputes
    //    as usual, and a 100 TB input never lands in executor
    //    storage.
    //
    //  - NONDETERMINISTIC input (rand/sample/limit upstream):
    //    re-execution could shift rows across buckets after the map
    //    was collected, so the input is pinned ONCE with an eager
    //    localCheckpoint. Blocks release on the failure path here and
    //    via the context cleaner once the caller drops the returned
    //    frame (checkpoint RDDs are cleaner-tracked; a Dataset-level
    //    persist would sit in the CacheManager forever). The cost —
    //    storage for the input, fail-stop instead of recompute on a
    //    lost block — is the price of a stable row set; fail-stop is
    //    the SAFE direction, a recompute could silently drift. The
    //    group join's raise_error guard backstops any residual drift
    //    into an unmapped bucket.
    // classified on `base` so a nondeterministic rangeCol (not just a
    // nondeterministic input frame) also routes to the pinned regime
    val base = df.withColumn("_brv", rangeCol.cast("long"))
    val ranged = if (isDeterministic(base)) base else base.localCheckpoint()
    try {
      trailingOn(ranged, part, partCols, tieCols, valCol,
        n, agg, outCol, targetBuckets, maxDriverRows)
    } catch {
      case t: Throwable =>
        if (ranged ne base) graft.functions.CheckpointOps.release(ranged)
        throw t
    }
  }

  /** True when re-executing `df`'s lineage is guaranteed to produce
    * the same ROWS. Checks, through subquery plans too
    * (`collectWithSubqueries` — a TABLESAMPLE inside a scalar
    * subquery is just as unstable as one at the top):
    *
    *  - nondeterministic expressions anywhere (rand, uuid,
    *    monotonically_increasing_id, nondeterministic UDFs);
    *  - row-set-unstable operators: Sample, LocalLimit/GlobalLimit/
    *    Offset (which rows pass depends on partition arrival order),
    *    Deduplicate (WHICH duplicate survives is order-dependent);
    *  - order-dependent aggregates First/Last (their value varies
    *    with shuffle fetch order even on deterministic data).
    *
    * The list is deliberately CONSERVATIVE-by-enumeration: anything
    * it matches is pinned; an exotic order-dependent construct it
    * misses can be handled by the caller pre-materializing (persist/
    * localCheckpoint) before calling [[trailing]] — the group join's
    * raise_error guard still catches cross-bucket drift loudly.
    */
  private def isDeterministic(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{First, Last}
    import org.apache.spark.sql.catalyst.plans.logical.{Deduplicate, GlobalLimit, LocalLimit, Offset, Sample}
    df.queryExecution.analyzed.collectWithSubqueries {
      case s: Sample => s
      case l: LocalLimit => l
      case l: GlobalLimit => l
      case o: Offset => o
      case d: Deduplicate => d
      case p if p.expressions.exists(e => e.exists {
        case _: First | _: Last => true
        case other => !other.deterministic
      }) => p
    }.isEmpty
  }

  /** Body of [[trailing]] over the `ranged` frame (input columns
    * plus the `_brv` long range image) — re-execution-stable by
    * construction: either a deterministic lineage or an eager
    * localCheckpoint (see the regime note in [[trailing]]).
    */
  private def trailingOn(
      ranged: DataFrame,
      part: Seq[Column],
      partCols: Seq[String],
      tieCols: Seq[String],
      valCol: String,
      n: Int,
      agg: Column => Column,
      outCol: String,
      targetBuckets: Int,
      maxDriverRows: Int): DataFrame = {
    val df = ranged.drop("_brv")
    val stats = ranged.agg(min(col("_brv")), max(col("_brv"))).head()
    if (stats.isNullAt(0) && ranged.isEmpty) {
      return df.withColumn(outCol, lit(null).cast(df.schema(valCol).dataType))
    }
    // all-null range on a NON-empty frame: lo/width are arbitrary (every
    // row coalesces into the MinValue bucket → one group per key, the
    // plain-window degenerate case) — still row-identical, never a
    // silently-null output
    val lo = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val hi = if (stats.isNullAt(0)) 0L else stats.getLong(1)
    // null range values sort first under ASC NULLS FIRST, so they get
    // the minimal bucket; RangeBuckets guarantees the mapping is
    // monotone even when the range domain spans more than Long.MaxValue
    // (plain `_brv - lo` long math would wrap and scramble bucket order)
    val bucketed = ranged.withColumn("_brb",
      coalesce(RangeBuckets.bucketExpr(col("_brv"), lo, hi, targetBuckets),
        lit(Long.MinValue)))

    // per-(key, bucket) counts: a distributed agg collapsed to a
    // metadata-scale frame (≤ |keys| × targetBuckets rows). The bound
    // is enforced BEFORE unbounded driver materialization: the limit
    // probe collects at most maxDriverRows + 1 rows, so a
    // high-cardinality misuse throws instead of OOMing the driver
    val counts = bucketed.groupBy(part :+ col("_brb"): _*)
      .agg(count(lit(1)).as("_bn"))
      .limit(maxDriverRows + 1)
      .collect()
    require(counts.length <= maxDriverRows,
      s"BucketedRolling count frame exceeds $maxDriverRows rows: " +
        "this operator is for low-cardinality keys")

    // greedy merge per key: scan buckets in order, close a group once
    // it holds >= n rows; a short final remainder folds into the
    // previous group, so every group except a key's ONLY group has
    // >= n rows (the carry-sufficiency invariant)
    val k = partCols.length
    val byKey = counts.groupBy(r => (0 until k).map(r.get).toSeq)
    val mapping = byKey.iterator.flatMap { case (key, rows) =>
      val buckets = rows.map(r => (r.getLong(k), r.getLong(k + 1)))
        .sortBy(_._1)
      val groups = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
      var cur = List.empty[Long]
      var curN = 0L
      buckets.foreach { case (b, cnt) =>
        cur = b :: cur; curN += cnt
        if (curN >= n) { groups += cur.reverse; cur = Nil; curN = 0 }
      }
      if (cur.nonEmpty) {
        if (groups.nonEmpty) groups(groups.length - 1) ++= cur.reverse
        else groups += cur.reverse
      }
      val nGroups = groups.length
      groups.iterator.zipWithIndex.flatMap { case (bs, g) =>
        bs.map(b => (key, b, g.toLong, nGroups.toLong))
      }
    }.toSeq

    // (key, bucket) -> (group, n_groups) lookup frame, broadcast; its
    // key columns carry `_mk_` names so the join is unambiguous, and
    // the match is null-safe (a null key is its own window group)
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val mapSchema = StructType(
      partCols.map(c => df.schema(c).copy(name = s"_mk_$c")) ++ Seq(
        StructField("_mb", LongType), StructField("_brg", LongType),
        StructField("_brng", LongType)))
    val mapDf = spark.createDataFrame(
      spark.sparkContext.parallelize(mapping.map { case (key, b, g, ng) =>
        org.apache.spark.sql.Row.fromSeq(key ++ Seq(b, g, ng)) }, 1),
      mapSchema)
    // LEFT join + loud guard, not an inner join: a row whose bucket is
    // missing from the collected map (possible only if a lost block of
    // a nondeterministic input recomputed differently after the map
    // was collected) must fail the query, never silently vanish
    val grouped0 = bucketed.join(broadcast(mapDf),
      (partCols.map(c => graft.functions.Cols.quoted(c) <=>
        graft.functions.Cols.quoted(s"_mk_$c")) :+
        (col("_brb") <=> col("_mb"))).reduce(_ && _), "left")
      .withColumn("_brg",
        when(col("_brg").isNotNull, col("_brg")).otherwise(raise_error(lit(
          "BucketedRolling: row landed in a bucket absent from the " +
            "collected map — a nondeterministic input re-executed after " +
            "a lost cache block; make the input deterministic and retry"))))
      .drop("_mb").drop(partCols.map(c => s"_mk_$c"): _*)

    // carry rows: each group's last n rows, re-tagged to the next
    // group (dropped for a key's final group)
    val wTail = Window.partitionBy(part :+ col("_brg"): _*)
      .orderBy(col("_brv").desc +:
        tieCols.map(graft.functions.Cols.quoted(_).desc): _*)
    val carries = grouped0
      .withColumn("_brt", row_number().over(wTail))
      .filter(col("_brt") <= n && col("_brg") < col("_brng") - 1)
      .drop("_brt")
      .withColumn("_brg", col("_brg") + 1)
      .withColumn("_brc", lit(1))
    val unioned = grouped0.withColumn("_brc", lit(0)).unionByName(carries)

    val wRoll = Window.partitionBy(part :+ col("_brg"): _*)
      .orderBy(col("_brv").asc +:
        tieCols.map(graft.functions.Cols.quoted(_).asc): _*)
      .rowsBetween(-n, -1)
    unioned
      .withColumn(outCol, agg(graft.functions.Cols.quoted(valCol)).over(wRoll))
      .filter(col("_brc") === 0)
      .select(df.columns.toIndexedSeq.map(graft.functions.Cols.quoted) :+
        graft.functions.Cols.quoted(outCol): _*)
  }
}
