package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Mergeable summary sketches beyond what Spark ships built-in
  * (hll_sketch_agg covers distinct counts, approx_percentile covers
  * quantiles — this module adds FREQUENCY estimation). All sketches
  * here are typed Aggregators: fixed-size buffers, partial+final
  * aggregation, lossless merge — the shape that lets a 100 TB pipeline
  * keep one tiny summary per partition/day and roll ANY coarser grain
  * up from summaries instead of rescanning data.
  */
object Sketches {

  /** A12/X2: Misra-Gries heavy-hitters sketch (top-frequency items) as
    * a mergeable typed Aggregator — O(k) state per group regardless of
    * input size or cardinality; the frequency companion to the HLL
    * (distinct) and quantile sketches.
    *
    * Guarantees (n = rows aggregated, k = capacity):
    *  - every reported count c̃ undercounts: c̃ ≤ c_true ≤ c̃ + n/(k+1);
    *  - every item with c_true > n/(k+1) IS present in the summary —
    *    no true heavy hitter is ever dropped;
    *  - with k ≥ distinct(items) no decrement ever fires and counts
    *    are EXACT (what makes the oracle query checkable);
    *  - merge (Agarwal et al., "Mergeable Summaries", PODS 2012): sum
    *    counters by key, then subtract the (k+1)-th largest count from
    *    all and drop non-positive — associative, preserves both bounds,
    *    so partial aggregation across any partitioning is lossless
    *    w.r.t. the error contract.
    *
    * Update is the classic stream form: hit → increment; room → insert;
    * full → decrement all (amortized O(1) per row — each decrement
    * pass pays back k prior insert-free rows).
    */
  class HeavyHittersAggregator(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
    require(k >= 1, "capacity must be positive")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b // SQL aggregate convention: NULLs don't count
      else b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < k => b.updated(v, 1L)
        case None => // full: decrement every counter, drop zeros
          b.flatMap { case (key, c) =>
            if (c > 1) Some(key -> (c - 1)) else None
          }
      }

    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val m = (x.keySet ++ y.keySet).iterator
        .map(key => key -> (x.getOrElse(key, 0L) + y.getOrElse(key, 0L)))
        .toMap
      if (m.size <= k) m
      else {
        // subtract the (k+1)-th largest count; at most k survive
        val d = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
        m.flatMap { case (key, c) =>
          if (c - d > 0) Some(key -> (c - d)) else None
        }
      }
    }

    override def finish(b: Map[String, Long]): Seq[(String, Long)] =
      b.toSeq.sortBy { case (item, c) => (-c, item) } // deterministic order

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Column-API heavy-hitters aggregate over a STRING column: returns
    * ARRAY<STRUCT<_1: item, _2: count>> sorted by (count desc, item).
    */
  def heavyHitters(k: Int): UserDefinedFunction =
    udaf(new HeavyHittersAggregator(k), Encoders.STRING)

  /** SQL-surface registration: `graft_heavy_hitters(col)` (capacity
    * `k`) becomes callable from plain `spark.sql`, like the
    * graft_cosine / graft_rolling_hash expressions.
    */
  def registerHeavyHitters(spark: org.apache.spark.sql.SparkSession,
      k: Int = 64): Unit =
    spark.udf.register("graft_heavy_hitters", heavyHitters(k)): Unit
}
