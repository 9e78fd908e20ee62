package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum (running total) — the scalable
  * replacement for `Window.partitionBy(lowCardKey).orderBy(ord)` cumsum.
  *
  * The naive one-window form sorts EVERY row of a partition key in a
  * single task; with a low-cardinality, Zipf-skewed key (language,
  * event type) that is most of a 100 TB corpus in one task. This
  * operator computes the identical integer result in two distributed
  * passes over order-range buckets:
  *
  *  1. bucket each row by a fixed range split of a LONG image of the
  *     order (`_psb` from [[RangeBuckets]]), and compute the
  *     WITHIN-bucket exclusive running sum with a window partitioned
  *     by (part..., _psb) — many bounded-size tasks, not one per key;
  *  2. aggregate per-bucket totals (a partial agg OVER THE WINDOW
  *     OUTPUT — Catalyst reuses the exchange, so the input is scanned
  *     and shuffled ONCE), cumsum them per key over the tiny
  *     (key × buckets) frame, and broadcast the resulting exclusive
  *     bucket offsets back: `out = bucket_offset + within_bucket_sum`.
  *
  * Exactness: the sums are integer (LongType), so the regrouping is
  * bit-identical to the single-window form — oracles are unchanged.
  * The bucket count is purely physical: any deterministic split of the
  * order domain yields the same result, so `targetBuckets` trades
  * per-bucket sort size (range/width rows) against offset-frame size
  * (key × buckets rows, must broadcast). The default 256 holds to
  * ~10^8 rows per key; at 10^10+ rows raise it to ~2^16 (offsets stay
  * a few MB). Range split assumes a roughly dense range image (true
  * for the corpus doc_id and for hash-valued orders); for
  * sparse/skewed domains substitute equi-depth boundaries from
  * `approxQuantile` — the result is bucket-invariant either way.
  *
  * Driver state: one `min/max` aggregate of the range image (2 longs),
  * or nothing when the caller states the range (`knownRange`).
  */
object PrefixSum {

  /** Append exclusive running-sum columns to `df` — single LONG order
    * column form.
    *
    * @param df        input frame; NOT re-ordered (join output order is
    *                  unspecified, as with any shuffle)
    * @param partCols  running-sum restart keys (may be empty = global)
    * @param ordCol    total-order column within a key (LONG-castable;
    *                  must be unique per key for a well-defined ROWS
    *                  frame, as with the one-window form)
    * @param vals      (valueColumn → outputColumn) pairs; values are
    *                  summed as LONG, nulls contribute 0
    * @param statsOf   optional frame to take the order-domain min/max
    *                  from — pass the RAW table when `df` is an
    *                  expensive derived frame (any superset range is
    *                  valid; buckets just come out sparser)
    * @param targetBuckets number of order-range buckets (physical knob)
    */
  def exclusive(
      df: DataFrame,
      partCols: Seq[String],
      ordCol: String,
      vals: Seq[(String, String)],
      statsOf: Option[DataFrame] = None,
      targetBuckets: Int = 256): DataFrame =
    exclusiveOrdered(df, partCols, Seq(col(ordCol).asc),
      col(ordCol).cast("long"), vals,
      statsOf = statsOf.map(d => d.select(col(ordCol).cast("long"))),
      targetBuckets = targetBuckets)

  /** General form: composite order plus an explicit LONG range image.
    *
    * `orderCols` carry their own direction (e.g. `col("q").desc,
    * col("id").asc`) and must totally order rows within a key.
    * `rangeCol` is any LONG expression computable on `df` that is
    * MONOTONE NON-DECREASING along the `orderCols` order — e.g.
    * `floor((1 - quality) * 2^20)` for a quality-descending order, or
    * the integer hash behind a hash-ordered sample. Rows only need to
    * land in order-consistent buckets; ties in `rangeCol` are fine
    * (tied rows share a bucket and the within-bucket window orders
    * them), and a null `rangeCol` row goes to the nulls-first bucket —
    * consistent with an `orderCols` order that sorts those rows first.
    *
    * @param knownRange (lo, hi) of `rangeCol` when the caller knows it
    *                   statically (a scaled [0,1] score, a 32-bit
    *                   hash): skips the min/max probe job entirely
    * @param statsOf    single-column LONG frame to probe min/max from
    *                   instead of `df` (cheapest-superset rule; see
    *                   `exclusive`)
    * @param nullImageLast where a NULL `rangeCol` bucket sorts among
    *                   the offsets: false (default) = first, matching
    *                   an `orderCols` order that sorts its null rows
    *                   FIRST (asc nulls-first, the Spark asc default);
    *                   true = last, matching desc nulls-last (the
    *                   Spark desc default). MUST agree with where
    *                   `orderCols` actually place the null-image rows
    *                   — a mismatch silently shifts every rank/sum
    *                   after them
    */
  def exclusiveOrdered(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      rangeCol: Column,
      vals: Seq[(String, String)],
      knownRange: Option[(Long, Long)] = None,
      statsOf: Option[DataFrame] = None,
      targetBuckets: Int = 256,
      nullImageLast: Boolean = false): DataFrame = {
    require(orderCols.nonEmpty, "PrefixSum: orderCols must be non-empty")
    def rangeOf(d: DataFrame, c: Column) =
      d.agg(min(c), max(c)).head()
    val (lo, hi) = knownRange.getOrElse {
      // an empty/all-null statsOf frame must NOT be conflated with an
      // empty df (all-zero sums would be silently wrong): fall back to
      // df's own range, and only short-circuit when df itself is empty
      val stats = statsOf.map(d => rangeOf(d, col(d.columns.head)))
        .filterNot(_.isNullAt(0))
        .getOrElse(rangeOf(df, rangeCol))
      if (stats.isNullAt(0)) {
        require(df.isEmpty,
          "PrefixSum: the range image is null on every row — " +
            "the running sum needs a total order (or pass knownRange)")
        return vals.foldLeft(df) { case (d, (_, out)) =>
          d.withColumn(out, lit(0L)) }
      }
      (stats.getLong(0), stats.getLong(1))
    }

    val part: Seq[Column] = partCols.map(col)
    val bucketed = df.withColumn(
      "_psb", RangeBuckets.bucketExpr(rangeCol, lo, hi, targetBuckets))

    // pass 1: within-bucket exclusive running sum (distributed: one
    // task per (key, bucket), each sorting at most a bucket's rows),
    // plus the within-bucket row number that pass 2's max_by keys on
    val wSpec = Window.partitionBy(part :+ col("_psb"): _*)
      .orderBy(orderCols: _*)
    val wIn = wSpec.rowsBetween(Window.unboundedPreceding, -1)
    val withIn0 = vals.zipWithIndex.foldLeft(bucketed) {
      case (d, ((v, _), i)) =>
        d.withColumn(s"_in$i",
          coalesce(sum(col(v).cast("long")).over(wIn), lit(0L)))
    }
    val withIn = withIn0.withColumn("_psrn", row_number().over(wSpec))

    // pass 2: per-bucket totals = the LAST row's inclusive sum,
    // `max_by(_in + value, _psrn)` — max_by evaluates AT the last row
    // of the bucket's order, and because the expression references the
    // window outputs (_in, _psrn) and the raw value, Catalyst can
    // neither push the agg below the window into a second scan nor
    // prune the two branches differently: when `df` is pre-projected
    // to exactly (part, order sources, values) — as the packing
    // queries do — both branches canonicalize to the same exchange and
    // the plan shows ONE shuffle of df + a ReusedExchange. The tiny
    // (key × buckets) totals frame is then cumsum'd per key and
    // broadcast back.
    def bt(i: Int) = {
      val (v, _) = vals(i)
      max_by(col(s"_in$i") + coalesce(col(v).cast("long"), lit(0L)),
        col("_psrn")).as(s"_bt$i")
    }
    val totals = withIn.groupBy(part :+ col("_psb"): _*)
      .agg(bt(0), vals.indices.tail.map(bt): _*)
    val psbOrder =
      if (nullImageLast) col("_psb").asc_nulls_last else col("_psb").asc
    val wOff = Window.partitionBy(part: _*).orderBy(psbOrder)
      .rowsBetween(Window.unboundedPreceding, -1)
    // offsets keys are re-aliased (`_k*`) so the offs↔withIn self-join
    // has no ambiguous attributes to warn about or mis-resolve
    val offs = vals.indices.foldLeft(totals) { (d, i) =>
      d.withColumn(s"_off$i",
        coalesce(sum(col(s"_bt$i")).over(wOff), lit(0L)))
    }.select(partCols.map(c => col(c).as(s"_k_$c")) ++
      (col("_psb").as("_k__psb") +:
        vals.indices.map(i => col(s"_off$i"))): _*)

    // null-safe join keys: a null partition key is its own group under
    // window semantics, so it must match its offsets row too
    val joinCond = (partCols :+ "_psb")
      .map(c => col(c) <=> col(s"_k_$c")).reduce(_ && _)
    val joined = withIn.join(broadcast(offs), joinCond)
    val withOut = vals.zipWithIndex.foldLeft(joined) {
      case (d, ((_, out), i)) =>
        d.withColumn(out, col(s"_off$i") + col(s"_in$i"))
    }
    withOut.select(df.columns.map(col).toIndexedSeq ++
      vals.map(v => col(v._2)): _*)
  }

  /** Distributed per-key row number (1-based) in `orderCols` order —
    * `row_number().over(Window.partitionBy(lowCardKey))` without the
    * one-task-per-key sort: the exclusive prefix COUNT plus one.
    * Same contracts as [[exclusiveOrdered]].
    */
  def rowNumber(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[Column],
      rangeCol: Column,
      outCol: String,
      knownRange: Option[(Long, Long)] = None,
      targetBuckets: Int = 256,
      nullImageLast: Boolean = false): DataFrame = {
    require(!df.columns.contains("_psone"),
      "PrefixSum.rowNumber: input already has a _psone column")
    val counted = exclusiveOrdered(df.withColumn("_psone", lit(1L)),
      partCols, orderCols, rangeCol, Seq("_psone" -> outCol),
      knownRange = knownRange, targetBuckets = targetBuckets,
      nullImageLast = nullImageLast)
    counted.withColumn(outCol, (col(outCol) + 1L).cast("int"))
      .drop("_psone")
  }
}
