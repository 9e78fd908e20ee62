package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series operators over the `events` table — the resample /
  * smooth / detect triad every metrics or sensor pipeline runs after
  * ingest (reference surface: the events stream feeding gold-zone
  * reporting; cf. reference `glue_infra.py` analytics-zone jobs).
  *
  * Scale notes: all three are single-shuffle shapes. ts1 aggregates to
  * the (type, hour) grain first — the dense grid + interpolation then
  * runs on the TINY aggregated frame (hours × types, not raw events);
  * ts2/ts3 are one window sort per key each, partition-local after the
  * hash exchange on the key. Nothing here widens with raw-event count
  * except the initial partial aggregation / window sort, both
  * map-side-combined or spill-safe — the shapes survive 100 TB of
  * events as long as a single (key) series' WINDOW STATE stays bounded
  * (trailing 8 / 24 rows here: constant).
  *
  * Oracle-determinism: hourly means go through exact DECIMAL sums
  * (Q.davg); interpolation weights are integer-hour ratios and the
  * EWMA decay is α=0.5 (a power of two), so every double operation is
  * either exact scaling or a single IEEE op written identically in the
  * DuckDB SQL — per-row double math is reproducible across engines
  * (established by the f3 oracles); only ORDER of multi-term addition
  * is not, and every multi-term sum here is decimal or 2-term.
  */
object TimeSeries extends QueryModule {

  private val HourUs = 3600L * 1000000L // microseconds per hour

  /** TS1: resample + linear interpolation. Hourly mean value per
    * event_type on a DENSE hour grid (min..max hour of that type);
    * hours with no events get the linear interpolation between the
    * neighboring observed hours. The canonical gap-repair before any
    * uniform-grid model (seasonality, forecasting) sees the series.
    */
  def ts1Interpolate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    // Observed grain: exact decimal mean per (type, hour-index).
    val hourly = ev
      .withColumn("hr", (unix_micros(col("ts").cast(TimestampType)) / HourUs)
        .cast(LongType))
      .groupBy(col("event_type"), col("hr"))
      .agg(Q.davg(col("value")).as("obs_mean"), count(lit(1)).as("n_events"))
    // Dense grid per type — sequence() on the aggregated extent only.
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("hr")).as("hr_min"), max(col("hr")).as("hr_max"))
      .select(col("event_type"),
        explode(sequence(col("hr_min"), col("hr_max"))).as("hr"))
    val joined = grid.join(hourly, Seq("event_type", "hr"), "left")
    // Previous/next observed point via ignoreNulls frames.
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col("obs_mean"), ignoreNulls = true).over(wPrev)
    val prevH = last(when(col("obs_mean").isNotNull, col("hr")), ignoreNulls = true).over(wPrev)
    val nextV = first(col("obs_mean"), ignoreNulls = true).over(wNext)
    val nextH = first(when(col("obs_mean").isNotNull, col("hr")), ignoreNulls = true).over(wNext)
    joined.select(
      col("event_type"),
      timestamp_micros(col("hr") * HourUs).cast("timestamp_ntz").as("hour_ts"),
      coalesce(col("n_events"), lit(0L)).as("n_events"),
      when(col("obs_mean").isNotNull, col("obs_mean"))
        .otherwise(prevV + (nextV - prevV)
          * ((col("hr") - prevH).cast(DoubleType)
            / (nextH - prevH).cast(DoubleType)))
        .as("value_interp"))
      .orderBy(col("event_type").asc, col("hour_ts").asc)
  }

  val ts1Oracle: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
       |    ${Q.sql.davg("value")} AS obs_mean, COUNT(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |grid AS (
       |  SELECT event_type, UNNEST(generate_series(MIN(hr), MAX(hr))) AS hr
       |  FROM hourly GROUP BY event_type),
       |joined AS (
       |  SELECT g.event_type, g.hr, h.obs_mean, h.n_events FROM grid g
       |  LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr),
       |framed AS (
       |  SELECT event_type, hr, obs_mean, n_events,
       |    LAST_VALUE(obs_mean IGNORE NULLS) OVER wp AS prev_v,
       |    LAST_VALUE(CASE WHEN obs_mean IS NOT NULL THEN hr END IGNORE NULLS)
       |      OVER wp AS prev_h,
       |    FIRST_VALUE(obs_mean IGNORE NULLS) OVER wn AS next_v,
       |    FIRST_VALUE(CASE WHEN obs_mean IS NOT NULL THEN hr END IGNORE NULLS)
       |      OVER wn AS next_h
       |  FROM joined
       |  WINDOW wp AS (PARTITION BY event_type ORDER BY hr
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    wn AS (PARTITION BY event_type ORDER BY hr
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT event_type, make_timestamp(hr * 3600000000) AS hour_ts,
       |  COALESCE(n_events, 0) AS n_events,
       |  CASE WHEN obs_mean IS NOT NULL THEN obs_mean
       |    ELSE prev_v + (next_v - prev_v)
       |      * (CAST(hr - prev_h AS DOUBLE) / CAST(next_h - prev_h AS DOUBLE))
       |  END AS value_interp
       |FROM framed
       |ORDER BY event_type ASC NULLS FIRST, hour_ts ASC NULLS FIRST""".stripMargin

  /** TS2: EWMA smoothing — 8-term exponentially weighted mean with
    * α = 1/2 over each user's event sequence. The finite-window form
    * (Σ α^k·x_{t-k} / Σ α^k over PRESENT lags) keeps it expressible as
    * a fixed lag combination: one window sort per user, O(1) state,
    * and — because 0.5^k scaling is exact in binary — bit-reproducible.
    */
  def ts2Ewma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val lags: Seq[Column] = (0 until 8).map(k => lag(col("value"), k).over(w))
    // Numerator / denominator written as explicit left-assoc chains so
    // the DuckDB SQL evaluates the identical float expression tree.
    val num = lags.zipWithIndex
      .map { case (x, k) => coalesce(x * lit(math.pow(0.5, k)), lit(0.0)) }
      .reduceLeft(_ + _)
    val den = lags.zipWithIndex
      .map { case (x, k) =>
        when(x.isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0)) }
      .reduceLeft(_ + _)
    Q.t(spark, dir, "events")
      .filter(col("user_id") < 100)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value"), (num / den).as("ewma8"))
      .orderBy(col("user_id").asc, col("ts").asc, col("event_id").asc)
  }

  val ts2Oracle: String = {
    val lagSql = (k: Int) => s"LAG(value, $k) OVER w"
    val num = (0 until 8)
      .map(k => s"COALESCE(${lagSql(k)} * ${math.pow(0.5, k)}, 0.0)")
      .mkString(" + ")
    val den = (0 until 8)
      .map(k => s"CASE WHEN ${lagSql(k)} IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END")
      .mkString(" + ")
    s"""SELECT user_id, event_id, ts, value, ($num) / ($den) AS ewma8
       |FROM events WHERE user_id < 100
       |WINDOW w AS (PARTITION BY user_id
       |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)
       |ORDER BY user_id ASC NULLS FIRST, ts ASC NULLS FIRST,
       |  event_id ASC NULLS FIRST""".stripMargin
  }

  /** TS3: breakout detection — events whose value strictly exceeds the
    * trailing-24-row maximum for their event_type (the rolling-extrema
    * anomaly flag; min/max frames are order-independent, so the oracle
    * is exact where rolling mean/std would not be).
    *
    * The rolling max runs through [[graft.operators.BucketedRolling]]
    * — (event_type, time-range-bucket) windows with a 24-row carry-in
    * from each bucket's predecessor — NOT a per-type window over raw
    * rows: event_type is low-cardinality, so the one-window form sorts
    * most of the table in a single task at 100 TB.
    */
  def ts3Extrema(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.BucketedRolling
    val ev = Q.t(spark, dir, "events")
      .select(col("event_type"), col("event_id"), col("ts"), col("value"))
    BucketedRolling.trailing(ev, Seq("event_type"),
        unix_micros(col("ts").cast("timestamp")), Seq("event_id"),
        "value", 24, max, "hi24")
      .filter(col("hi24").isNotNull && col("value") > col("hi24"))
      .orderBy(col("event_type").asc, col("ts").asc, col("event_id").asc)
  }

  val ts3Oracle: String =
    """SELECT * FROM (
      |  SELECT event_type, event_id, ts, value,
      |    MAX(value) OVER (PARTITION BY event_type
      |      ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
      |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS hi24
      |  FROM events)
      |WHERE hi24 IS NOT NULL AND value > hi24
      |ORDER BY event_type ASC NULLS FIRST, ts ASC NULLS FIRST,
      |  event_id ASC NULLS FIRST""".stripMargin

  /** TS4: seasonal profile decomposition — the additive
    * seasonal-naive model's first stage: per (event_type, hour-of-day),
    * the seasonal mean and its deviation from the type's grand mean.
    * The classic-decomposition seasonal component on the daily cycle:
    * what a metrics pipeline subtracts before anomaly detection, and
    * the profile a capacity planner reads directly.
    *
    * Exactness: both means are exact decimal sums over doubles divided
    * once; the deviation is ONE double subtraction of two exact
    * quotients — reproducible across engines. Two map-side-combined
    * aggs (hour grain, then type grain) + a broadcast join of the
    * 24×types profile against the ≤types grand-mean frame.
    */
  def ts4Seasonal(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
      .select(col("event_type"), hour(col("ts")).as("hod"), col("value"))
    val hourly = ev.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"), Q.davg(col("value")).as("seasonal_mean"))
    val global = ev.groupBy(col("event_type"))
      .agg(Q.davg(col("value")).as("grand_mean"))
    hourly.join(broadcast(global), Seq("event_type"))
      .withColumn("seasonal_dev", col("seasonal_mean") - col("grand_mean"))
      .select("event_type", "hod", "n", "seasonal_mean", "grand_mean", "seasonal_dev")
      .orderBy(col("event_type").asc, col("hod").asc)
  }

  val ts4Oracle: String =
    s"""WITH hourly AS (
       |  SELECT event_type, CAST(hour(ts) AS INT) AS hod, COUNT(*) AS n,
       |    ${Q.sql.davg("value")} AS seasonal_mean
       |  FROM events GROUP BY 1, 2),
       |grand AS (
       |  SELECT event_type, ${Q.sql.davg("value")} AS grand_mean
       |  FROM events GROUP BY 1)
       |SELECT hourly.event_type, hod, n, seasonal_mean, grand_mean,
       |  seasonal_mean - grand_mean AS seasonal_dev
       |FROM hourly JOIN grand ON hourly.event_type = grand.event_type
       |ORDER BY hourly.event_type ASC NULLS FIRST, hod ASC NULLS FIRST""".stripMargin

  /** TS5: robust anomaly detection via median/MAD — the outlier flag
    * that survives the outliers themselves (mean/stddev z-scores are
    * corrupted by the very anomalies they hunt; median and MAD have a
    * 50% breakdown point). Events whose absolute deviation from their
    * type's median exceeds 3.5× the median absolute deviation.
    *
    * Exactness: `percentile` ≡ DuckDB `quantile_cont` (A7 proves the
    * parity), deviations are single IEEE subtractions, the flag is a
    * division compare — all deterministic. Two grouped aggregations +
    * two broadcast joins of the ≤|types| summary frames; the events
    * scan is the only big pass.
    */
  def ts5Anomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("mad") > 0 && col("adev") / col("mad") > 3.5)
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))
      .orderBy(col("event_id").asc)
  }

  val ts5Oracle: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value, m.med,
      |    abs(e.value - m.med) AS adev
      |  FROM events e JOIN med m ON e.event_type = m.event_type),
      |mad AS (
      |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT d.event_id, d.event_type, d.value, d.med, mad.mad
      |FROM dev d JOIN mad ON d.event_type = mad.event_type
      |WHERE mad.mad > 0 AND d.adev / mad.mad > 3.5
      |ORDER BY d.event_id ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts1_interpolate" -> ts1Interpolate,
    "ts2_ewma" -> ts2Ewma,
    "ts3_extrema" -> ts3Extrema,
    "ts4_seasonal" -> ts4Seasonal,
    "ts5_anomaly" -> ts5Anomaly)

  override def oracles: Map[String, String] = Map(
    "ts1_interpolate" -> ts1Oracle,
    "ts2_ewma" -> ts2Oracle,
    "ts3_extrema" -> ts3Oracle,
    "ts4_seasonal" -> ts4Oracle,
    "ts5_anomaly" -> ts5Oracle)
}
