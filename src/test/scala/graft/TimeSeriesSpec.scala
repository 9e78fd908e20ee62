package graft

import graft.queries.{Dedup, TimeSeries}
import org.apache.spark.sql.functions._

/** Semantic invariants of the time-series triad (ts1-ts3) and the
  * substring-span dedup (d10) that the row-level oracle can't express:
  * interpolation is exact on observed points and linear between them,
  * EWMA of a constant series is that constant, breakouts strictly
  * dominate their trailing window, and planted span duplication is
  * detected with the right counts.
  */
class TimeSeriesSpec extends SparkTestBase {
  quiet()

  test("ts1: grid is dense, observed hours keep their mean, gaps interpolate linearly") {
    val out = TimeSeries.ts1Interpolate(spark, sf).cache()

    // dense: per type, rows == span between min and max hour inclusive
    out.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        ((unix_micros(max(col("hour_ts")).cast("timestamp"))
          - unix_micros(min(col("hour_ts")).cast("timestamp")))
          / lit(3600000000L) + 1L).as("span"))
      .collect().foreach(r => assert(r.getLong(1) === r.getDouble(2).toLong,
        s"${r.getString(0)}: grid has holes"))

    // no unfilled values anywhere inside the span except a leading/
    // trailing run with no neighbor on one side (min/max hour of an
    // observed point bound the grid, so there is none here)
    assert(out.filter(col("value_interp").isNull).count() === 0)

    // observed hours: value_interp equals the recomputed exact mean
    val ev = Q.t(spark, sf, "events")
      .withColumn("hr", (unix_micros(col("ts").cast("timestamp")) / 3600000000L).cast("long"))
      .groupBy(col("event_type"), col("hr"))
      .agg(Q.davg(col("value")).as("want"), count(lit(1)).as("n"))
    val joined = out
      .withColumn("hr", (unix_micros(col("hour_ts").cast("timestamp")) / 3600000000L).cast("long"))
      .join(ev, Seq("event_type", "hr"))
    assert(joined.filter(col("value_interp") =!= col("want")).count() === 0)
    assert(joined.filter(col("n_events") =!= col("n")).count() === 0)

    // gap rows: collinear with the surrounding observed points — the
    // second difference of consecutive interpolated values inside one
    // gap is ~0 (linearity), checked on any type with a gap
    val gaps = out.filter(col("n_events") === 0).count()
    if (gaps > 0) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      val secondDiff = out
        .withColumn("d1", col("value_interp") - lag(col("value_interp"), 1).over(w))
        .withColumn("d2", col("d1") - lag(col("d1"), 1).over(w))
        // only rows strictly inside a gap (this row and both lags unfilled)
        .withColumn("inGap",
          col("n_events") === 0
            && lag(col("n_events"), 1).over(w) === 0
            && lag(col("n_events"), 2).over(w) === 0)
        .filter(col("inGap") && abs(col("d2")) > 1e-9)
      assert(secondDiff.count() === 0, "interior gap rows must be collinear")
    }
  }

  test("ts2: EWMA of a constant series is the constant; first row equals its value") {
    import spark.implicits._
    val const = (1 to 40)
      .map(i => (1L, i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"), 7.5))
      .toDF("user_id", "event_id", "ts", "value")
    const.createOrReplaceTempView("events_const")
    // run the same lag-combination shape against the constant frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val lags = (0 until 8).map(k => lag(col("value"), k).over(w))
    val num = lags.zipWithIndex
      .map { case (x, k) => coalesce(x * lit(math.pow(0.5, k)), lit(0.0)) }
      .reduceLeft(_ + _)
    val den = lags.zipWithIndex
      .map { case (x, k) => when(x.isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    val got = const.select((num / den).as("ewma8")).distinct().collect()
    assert(got.length === 1 && got(0).getDouble(0) === 7.5)

    // and on the real table: every ewma8 lies within the min..max of
    // that user's trailing 8 values (convexity of the weights)
    val out = TimeSeries.ts2Ewma(spark, sf)
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-7, 0)
    val bounded = out
      .withColumn("lo", min(col("value")).over(wr))
      .withColumn("hi", max(col("value")).over(wr))
      .filter(col("ewma8") < col("lo") - lit(1e-12)
        || col("ewma8") > col("hi") + lit(1e-12))
    assert(bounded.count() === 0, "EWMA must be a convex combination")
  }

  test("ts3: every breakout strictly exceeds all 24 preceding values of its type") {
    val out = TimeSeries.ts3Extrema(spark, sf).cache()
    assert(out.count() > 0, "sf0.001 events must contain some breakouts")
    // recompute the trailing max independently via a self-join bound
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-24, -1)
    val want = Q.t(spark, sf, "events")
      .withColumn("hi24", max(col("value")).over(w))
      .filter(col("hi24").isNotNull && col("value") > col("hi24"))
    assert(out.count() === want.count())
    assert(out.join(want, Seq("event_id"), "left_anti").count() === 0)
  }

  test("d10: planted repeated span is counted; unique docs are absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "we saw the quick brown fox jumps over a fence"),
      (3L, "completely unrelated words forming one unique sentence here"),
      (4L, "short text")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("d10").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Dedup.d10SpanDedup(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // docs 1 and 2 share the 5-gram "the quick brown fox jumps"
    // (and "quick brown fox jumps over"): both flagged with 2 dup spans
    assert(out.contains(1L) && out.contains(2L))
    assert(out(1L)._2 === 2L && out(2L)._2 === 2L)
    // docs 1 and 2 both have 10 tokens -> 6 spans each
    assert(out(1L)._1 === 6L && out(2L)._1 === 6L)
    // unique doc 3 and too-short doc 4 are absent
    assert(!out.contains(3L) && !out.contains(4L))
  }
}
