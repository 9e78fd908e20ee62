package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering key for two numeric columns — the
  * multi-dimensional OPTIMIZE ZORDER primitive (Delta/Iceberg's answer
  * to "range queries on EITHER column must skip files").
  *
  * Construction: each column is quantile-bucketed into 2^bits ranks,
  * then the rank bits are interleaved into one integer. Sorting by the
  * interleaved value places rows that are close in BOTH dimensions into
  * the same file, so per-file min/max stay narrow on both columns —
  * unlike a single-column sort, which leaves the second column's
  * per-file range spanning the whole domain.
  *
  * Scale: quantile boundaries come from ONE distributed
  * `approxQuantile` pass (Greenwald–Khanna sketch, mergeable partials)
  * and land in the plan as literals; the bucket + interleave math is
  * pure codegen'd column arithmetic. Quantile (not uniform-width)
  * buckets keep the curve balanced under skewed value distributions —
  * uniform buckets would pile skewed data into one z-cell and nothing
  * would skip.
  */
object ZOrder {

  /** Bucket index 0..boundaries.size via a monotone sum of boundary
    * comparisons (codegen-friendly; no UDF, no join).
    */
  def bucketExpr(c: Column, boundaries: Seq[Double]): Column =
    boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c >= lit(b), lit(1)).otherwise(lit(0))
    }

  /** Interleave the low `bits` bits of two bucket indices:
    * z = … b1[1] b2[1] b1[0] b2[0].
    */
  def interleaveBits(b1: Column, b2: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0)) { (acc, i) =>
      acc +
        shiftleft(shiftright(b1, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(b2, i).bitwiseAND(lit(1)), 2 * i)
    }

  /** Z-value column for (c1, c2), quantile-bucketed to 2^bits ranks
    * per dimension. Numeric columns only (quantiles of strings are not
    * defined here).
    */
  def zValue(df: DataFrame, c1: String, c2: String, bits: Int = 4): Column = {
    val nCuts = (1 << bits) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    // both columns' boundaries from ONE sketch pass over the table
    val Array(q1, q2) = df.stat.approxQuantile(Array(c1, c2), probs, 0.01)
    interleaveBits(
      bucketExpr(col(c1).cast("double"), q1.toSeq),
      bucketExpr(col(c2).cast("double"), q2.toSeq), bits)
  }
}
