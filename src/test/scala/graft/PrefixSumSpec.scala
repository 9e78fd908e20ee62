package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PrefixSum (two-pass distributed cumsum) ≡ the single-window form —
  * the exact-integer regrouping invariant the packing family
  * (mix2/mix7/mix8, tx_vocab_growth) relies on.
  */
class PrefixSumSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def naive(part: Seq[String], ord: String, v: String) = {
    val w = (if (part.isEmpty) Window.partitionBy()
             else Window.partitionBy(part.map(col): _*))
      .orderBy(col(ord).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    coalesce(sum(col(v)).over(w), lit(0L))
  }

  test("matches single-window cumsum on a skewed keyed frame") {
    // one dominant key (the Zipf shape that motivates the operator),
    // sparse ords, and many buckets relative to rows
    val rows = (0L until 500L).map { i =>
      val k = if (i % 10 < 8) "en" else if (i % 10 == 8) "de" else "fr"
      (k, i * 7 + (i % 3), i % 13)
    }
    val df = rows.toDF("lang", "doc_id", "n")
    val got = PrefixSum.exclusive(df, Seq("lang"), "doc_id",
        Seq("n" -> "before"), targetBuckets = 16)
      .select("lang", "doc_id", "before")
    val want = df.select(col("lang"), col("doc_id"),
      naive(Seq("lang"), "doc_id", "n").as("before"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("global (no partition keys) + multiple value columns") {
    val df = (0L until 100L).map(i => (i, i % 5, i % 7))
      .toDF("ord", "a", "b")
    val got = PrefixSum.exclusive(df, Seq.empty, "ord",
        Seq("a" -> "ca", "b" -> "cb"), targetBuckets = 8)
      .select("ord", "ca", "cb")
    val want = df.select(col("ord"),
      naive(Nil, "ord", "a").as("ca"), naive(Nil, "ord", "b").as("cb"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("null values contribute zero, like sum-over-window") {
    val df = Seq(("x", 1L, Some(5L)), ("x", 2L, None), ("x", 3L, Some(2L)),
      ("x", 4L, None), ("x", 5L, Some(1L)))
      .toDF("k", "ord", "n")
    val got = PrefixSum.exclusive(df, Seq("k"), "ord", Seq("n" -> "before"),
        targetBuckets = 3)
      .orderBy("ord").select("before").as[Long].collect()
    assert(got.toSeq == Seq(0L, 5L, 5L, 7L, 7L))
  }

  test("exclusiveOrdered: composite desc order + knownRange matches naive") {
    // the mix3 shape: rank by (score desc, id asc) with the range
    // image floor((1-score)·K) — monotone along the descending order —
    // and a statically known range (no probe job)
    val rows = (0L until 300L).map { i =>
      val k = if (i % 4 < 3) "en" else "fr"
      (k, i, ((i * 31) % 97).toDouble / 97.0)
    }
    val df = rows.toDF("k", "id", "score")
    val got = graft.operators.PrefixSum.rowNumber(df, Seq("k"),
        Seq(col("score").desc, col("id").asc),
        floor((lit(1.0) - col("score")) * lit(1024.0)).cast("long"),
        "rn", knownRange = Some((0L, 1024L)), targetBuckets = 16)
      .select("k", "id", "rn")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("score").desc, col("id").asc)
    val want = df.select(col("k"), col("id"),
      row_number().over(w).as("rn"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("rowNumber nullImageLast: null scores rank last like desc nulls-last") {
    // a null score yields a null range image; under the Spark `desc`
    // default (NULLS LAST) those rows must rank AFTER every scored row
    // — without nullImageLast the null bucket's offsets accumulate
    // first and every rank in the key silently shifts (the review-pass
    // bug in the mix3 rewrite)
    val df = Seq(("k", 1L, Some(0.9)), ("k", 2L, None), ("k", 3L, Some(0.5)),
      ("k", 4L, None), ("k", 5L, Some(0.7)))
      .toDF("k", "id", "score")
    val got = graft.operators.PrefixSum.rowNumber(df, Seq("k"),
        Seq(col("score").desc, col("id").asc),
        floor((lit(1.0) - col("score")) * lit(64.0)).cast("long"),
        "rn", knownRange = Some((0L, 64L)), nullImageLast = true)
      .orderBy("id").select("rn").as[Int].collect()
    // score order: 0.9 (id1), 0.7 (id5), 0.5 (id3), then nulls id2, id4
    assert(got.toSeq == Seq(1, 4, 3, 5, 2))
  }

  test("exclusiveOrdered: tied range image values share a bucket safely") {
    // many rows collapsing to one range value: the within-bucket
    // window alone must order them
    val df = (0L until 50L).map(i => ("k", i, 7L, 1L))
      .toDF("k", "id", "r", "n")
    val got = graft.operators.PrefixSum.exclusiveOrdered(df, Seq("k"),
        Seq(col("id").asc), col("r"), Seq("n" -> "before"),
        knownRange = Some((0L, 10L)), targetBuckets = 4)
      .orderBy("id").select("before").as[Long].collect()
    assert(got.toSeq == (0L until 50L).toSeq)
  }

  test("order domain spanning more than Long.MaxValue (signed hashes)") {
    // a signed 64-bit hash/fingerprint used as the total order: lo near
    // Long.MinValue and hi near Long.MaxValue, so hi - lo WRAPS under
    // long arithmetic. Before the RangeBuckets decimal regime this
    // collapsed width to garbage and mapped non-negative ords to
    // NEGATIVE buckets sorting BEFORE the negative ords' buckets —
    // silently wrong running sums (fail-on-revert verified)
    val ords = Seq(Long.MinValue + 5, Long.MinValue / 2, -1000L, 0L,
      12345L, Long.MaxValue / 2, Long.MaxValue - 3)
    val df = ords.zipWithIndex.map { case (o, i) => ("k", o, (i + 1).toLong) }
      .toDF("k", "ord", "n")
    val got = PrefixSum.exclusive(df, Seq("k"), "ord", Seq("n" -> "before"),
        targetBuckets = 4)
      .orderBy("ord").select("before").as[Long].collect()
    // exclusive running sums of 1..7 in ord order
    assert(got.toSeq == Seq(0L, 1L, 3L, 6L, 10L, 15L, 21L))
  }

  test("statsOf superset range and empty input") {
    val base = (0L until 1000L).map(i => ("k", i, 1L)).toDF("k", "ord", "n")
    val filtered = base.filter(col("ord") % 100 === 0) // sparse in range
    val got = PrefixSum.exclusive(filtered, Seq("k"), "ord",
        Seq("n" -> "before"), statsOf = Some(base), targetBuckets = 16)
      .orderBy("ord").select("before").as[Long].collect()
    assert(got.toSeq == (0L until 10L))

    val empty = base.filter(lit(false))
    val e = PrefixSum.exclusive(empty, Seq("k"), "ord", Seq("n" -> "before"))
    assert(e.columns.contains("before") && e.count() == 0)
  }

  test("empty statsOf frame falls back to df's own range, never zeros") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, 3L)).toDF("k", "ord", "n")
    val emptyStats = df.filter(lit(false))
    val got = PrefixSum.exclusive(df, Seq("k"), "ord", Seq("n" -> "before"),
        statsOf = Some(emptyStats))
      .orderBy("ord").select("before").as[Long].collect()
    assert(got.toSeq == Seq(0L, 5L))
  }

  test("all-null order column on a non-empty frame fails loudly") {
    val df = Seq(("k", 5L), ("k", 3L)).toDF("k", "n")
      .withColumn("ord", lit(null).cast("long"))
    val e = intercept[IllegalArgumentException] {
      PrefixSum.exclusive(df, Seq("k"), "ord", Seq("n" -> "before"))
    }
    assert(e.getMessage.contains("null on every row"))
  }

  test("single bucket degenerates to the plain window result") {
    val df = Seq(("a", 1L, 2L), ("a", 2L, 3L), ("b", 1L, 4L))
      .toDF("k", "ord", "n")
    val got = PrefixSum.exclusive(df, Seq("k"), "ord", Seq("n" -> "before"),
        targetBuckets = 1)
      .orderBy("k", "ord").select("before").as[Long].collect()
    assert(got.toSeq == Seq(0L, 2L, 0L))
  }
}
