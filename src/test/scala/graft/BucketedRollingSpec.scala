package graft

import graft.operators.BucketedRolling
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BucketedRolling (bucket + carry-in trailing window) ≡ the
  * single-window form — the row-identity invariant ts3_extrema relies
  * on, exercised across bucket-boundary and short-bucket shapes.
  */
class BucketedRollingSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ord").asc, col("tie").asc)
      .rowsBetween(-n, -1)
    df.withColumn("want", max(col("v")).over(w))
  }

  private def check(rows: Seq[(String, Long, Long, Double)], n: Int,
      buckets: Int): Unit = {
    val df = rows.toDF("k", "ord", "tie", "v")
    val got = BucketedRolling.trailing(df, Seq("k"), col("ord"),
      Seq("tie"), "v", n, max, "got", targetBuckets = buckets)
    val j = got.join(naive(df, n), Seq("k", "ord", "tie", "v"))
    assert(j.count() == rows.length)
    val bad = j.filter(!(col("got") <=> col("want"))).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("matches single-window trailing max across bucket boundaries") {
    val rows = (0L until 400L).map { i =>
      val k = if (i % 5 < 4) "hot" else "cold"
      (k, i * 3, i, math.sin(i.toDouble) * 100)
    }
    check(rows, 24, 16)
  }

  test("buckets shorter than the frame trigger greedy merging") {
    // 200 rows over a huge sparse range with 64 target buckets: most
    // buckets hold ~3 rows < n=24, so correctness depends on the
    // greedy >=n merge invariant
    val rows = (0L until 200L).map(i => ("k", i * i * 7, i, (i % 17).toDouble))
    check(rows, 24, 64)
  }

  test("frame of 1 and key with fewer rows than the frame") {
    check(Seq(("a", 1L, 0L, 5.0), ("a", 2L, 0L, 3.0), ("b", 9L, 0L, 1.0)),
      24, 8)
    check((0L until 50L).map(i => ("z", i, i, i.toDouble * 1.5)), 1, 10)
  }

  test("tied range values stay in one bucket and order by the tie column") {
    val rows = (0L until 120L).map(i => ("k", i / 10, i, (i % 7).toDouble))
    check(rows, 5, 32)
  }

  test("all-null range column still matches the single-window form") {
    // nulls sort first under ASC NULLS FIRST in both forms; the
    // operator must degrade to one group per key, not emit nulls
    val df = Seq(("k", 0L, 5.0), ("k", 1L, 2.0), ("k", 2L, 9.0))
      .toDF("k", "tie", "v")
      .withColumn("ord", lit(null).cast("long"))
    val got = BucketedRolling.trailing(df, Seq("k"), col("ord"), Seq("tie"),
      "v", 2, max, "got", targetBuckets = 4)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ord").asc, col("tie").asc).rowsBetween(-2, -1)
    val want = df.withColumn("want", max(col("v")).over(w))
    val j = got.join(want, Seq("k", "tie", "v"))
    assert(j.count() === 3 && j.filter(!(col("got") <=> col("want"))).isEmpty)
  }

  test("min aggregate and empty input") {
    val df = (0L until 60L).map(i => ("k", i, i, (i % 9).toDouble))
      .toDF("k", "ord", "tie", "v")
    val got = BucketedRolling.trailing(df, Seq("k"), col("ord"), Seq("tie"),
      "v", 7, min, "got", targetBuckets = 6)
    val w = Window.partitionBy(col("k")).orderBy(col("ord"), col("tie"))
      .rowsBetween(-7, -1)
    val want = df.withColumn("want", min(col("v")).over(w))
    val j = got.join(want, Seq("k", "ord", "tie", "v"))
    assert(j.filter(!(col("got") <=> col("want"))).isEmpty)

    val empty = df.filter(lit(false))
    val e = BucketedRolling.trailing(empty, Seq("k"), col("ord"), Seq("tie"),
      "v", 7, min, "got")
    assert(e.columns.contains("got") && e.count() == 0)
  }

  test("range domain spanning more than Long.MaxValue (signed hashes)") {
    // lo near Long.MinValue and hi near Long.MaxValue: `hi - lo` and
    // `_brv - lo` wrap under long arithmetic, which before the
    // RangeBuckets decimal regime assigned later rows to SMALLER
    // bucket ids — carry-forward then ran in the wrong order and the
    // trailing aggregates silently diverged from the single-window
    // form (fail-on-revert verified)
    val ords = Seq(Long.MinValue + 9, Long.MinValue / 3, -77L, 0L, 4242L,
      Long.MaxValue / 5, Long.MaxValue / 2, Long.MaxValue - 11)
    val rows = ords.zipWithIndex.map { case (o, i) =>
      ("k", o, i.toLong, ((i * 37) % 11).toDouble)
    }
    check(rows, 3, 4)
  }

  test("input lineage executes exactly once (nondeterministic inputs)") {
    // trailing() runs several passes (range probe, count collect,
    // final window); a NONDETERMINISTIC input must be materialized
    // once (eager localCheckpoint) or the re-executed rows could land
    // in buckets missing from the collected (key,bucket)->group map
    // and the group join dropped them silently (the left-join guard
    // now raises on that residual path). The accumulator counts
    // input-row evaluations: exactly one per row means one
    // materialization feeds every pass (fail-on-revert: without the
    // checkpoint the count is >= 2x the row count). The udf is marked
    // nondeterministic so the operator classifies the input into the
    // pinned regime — a deterministic lineage deliberately re-executes
    // instead of pinning 100 TB into executor storage.
    val acc = spark.sparkContext.longAccumulator("rolling_input_rows")
    val tick = udf { (i: Long) => acc.add(1L); i }.asNondeterministic()
    val df = spark.range(300)
      .select(col("id").as("tie"), lit("k").as("k"),
        tick(col("id")).as("ord"), (col("id") % 13).cast("double").as("v"))
    val got = BucketedRolling.trailing(df, Seq("k"), col("ord"), Seq("tie"),
      "v", 5, max, "got", targetBuckets = 8)
    assert(got.count() === 300)
    assert(acc.value === 300L,
      s"input lineage ran ${acc.value / 300.0}x — trailing() must " +
        "materialize the input once before collecting the bucket map")
    // and a genuinely nondeterministic order column must never lose
    // rows to a stale bucket map
    val nondet = spark.range(500)
      .select(col("id").as("tie"), lit("k").as("k"),
        (rand() * 1e6).cast("long").as("ord"),
        (col("id") % 7).cast("double").as("v"))
    val r = BucketedRolling.trailing(nondet, Seq("k"), col("ord"), Seq("tie"),
      "v", 24, max, "got", targetBuckets = 16)
    assert(r.count() === 500, "nondeterministic input rows were dropped")
  }

  test("row-set-unstable plans (dropDuplicates) also pin the input") {
    // Deduplicate has only deterministic EXPRESSIONS, but WHICH
    // duplicate survives depends on shuffle arrival order — the
    // classifier must treat it as unstable and materialize once
    // (fail-on-revert: drop the Deduplicate case from isDeterministic
    // and the lineage runs >= 2x, acc >= 600)
    val acc = spark.sparkContext.longAccumulator("rolling_dedup_rows")
    val tick = udf { (i: Long) => acc.add(1L); i }
    val df = spark.range(300)
      .select(tick(col("id")).as("tie"), lit("k").as("k"),
        col("id").as("ord"), (col("id") % 13).cast("double").as("v"))
      .dropDuplicates("tie")
    val got = BucketedRolling.trailing(df, Seq("k"), col("ord"), Seq("tie"),
      "v", 5, max, "got", targetBuckets = 8)
    assert(got.count() === 300)
    assert(acc.value === 300L,
      s"dropDuplicates input evaluated ${acc.value / 300.0}x — " +
        "row-set-unstable plans must be checkpointed")
  }

  test("driver count-frame cap throws before materializing") {
    // 40 distinct keys with maxDriverRows = 10: the limit probe must
    // reject the misuse loudly instead of collecting the whole
    // (key × bucket) frame onto the driver
    val df = (0L until 40L).map(i => (s"k$i", i, i, 1.0))
      .toDF("k", "ord", "tie", "v")
    val ex = intercept[IllegalArgumentException] {
      BucketedRolling.trailing(df, Seq("k"), col("ord"), Seq("tie"),
        "v", 2, max, "got", targetBuckets = 4, maxDriverRows = 10)
    }
    assert(ex.getMessage.contains("count frame exceeds"))
  }
}
