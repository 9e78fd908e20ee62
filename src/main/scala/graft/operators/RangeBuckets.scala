package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Monotone range→bucket mapping shared by [[PrefixSum]] and
  * [[BucketedRolling]]. Bucketing needs only MONOTONICITY (ord1 ≤ ord2
  * ⟹ bucket1 ≤ bucket2): any deterministic monotone split yields the
  * same operator result, so the math may round — it must never wrap.
  *
  * The fast path keeps pure long/double arithmetic (IEEE division and
  * long truncation are monotone). But when the order domain spans more
  * than Long.MaxValue — a signed 64-bit hash or fingerprint used as
  * the total order does — `ord - lo` and `hi - lo` WRAP silently under
  * non-ANSI long arithmetic: width collapses and rows past `lo + 2^63`
  * map to NEGATIVE bucket ids that sort BEFORE earlier rows', which
  * scrambles the bucket-order-consistent-with-row-order invariant both
  * operators are built on. That regime computes in DECIMAL instead —
  * exact subtraction, monotone rounded division — and is only paid
  * when the domain demands it.
  */
private[operators] object RangeBuckets {

  /** Bucket id (LONG, in [0, targetBuckets]) for `ordLong` ∈ [lo, hi]. */
  def bucketExpr(
      ordLong: Column, lo: Long, hi: Long, targetBuckets: Int): Column = {
    val span = BigInt(hi) - BigInt(lo)
    if (span <= Long.MaxValue) {
      val width = math.max(1L, (span / targetBuckets).toLong + 1)
      ((ordLong - lit(lo)) / lit(width)).cast("long")
    } else {
      val width = span / targetBuckets + 1
      floor((ordLong.cast("decimal(20,0)") - lit(BigDecimal(lo))) /
        lit(BigDecimal(width))).cast("long")
    }
  }
}
