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

  /** Interleave the low `bits` bits of N bucket indices: bit i of
    * dimension j lands at position i*N + (N-1-j), so earlier columns
    * take the more significant interleaved slots.
    */
  def interleaveBits(bs: Seq[Column], bits: Int): Column = {
    val n = bs.length
    (0 until bits).foldLeft(lit(0)) { (acc, i) =>
      bs.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a + shiftleft(shiftright(b, i).bitwiseAND(lit(1)), i * n + (n - 1 - j))
      }
    }
  }

  def interleaveBits(b1: Column, b2: Column, bits: Int): Column =
    interleaveBits(Seq(b1, b2), bits)

  /** Z-value column for N columns, quantile-bucketed to 2^bits ranks
    * per dimension. Numeric columns only (quantiles of strings are not
    * defined here). One sketch pass computes every column's
    * boundaries; more dimensions dilute per-dimension clustering (the
    * usual z-order trade — 2-4 columns is the practical range).
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.size >= 2, "z-order needs at least two columns")
    val nCuts = (1 << bits) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    // all columns' boundaries from ONE sketch pass over the table
    val qs = df.stat.approxQuantile(cols.toArray, probs, 0.01)
    interleaveBits(
      cols.zip(qs.toSeq).map { case (c, q) =>
        bucketExpr(col(c).cast("double"), q.toSeq)
      }, bits)
  }

  def zValue(df: DataFrame, c1: String, c2: String, bits: Int = 4): Column =
    zValue(df, Seq(c1, c2), bits)
}
