package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A query module contributes named queries + their DuckDB oracle SQL.
  *
  * Contract (driver harness): for each key in `queries`, the DataFrame
  * result is dumped to parquet and compared against the DuckDB result of
  * `oracles(key)` run over the same tables — row/schema/hash match. Keys
  * present in `queries` but absent from `oracles` get a weaker rows-only
  * check (used for non-SQL-expressible operators).
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}

/** Shared helpers enforcing the oracle-determinism discipline:
  *
  *  - Double columns summed across partitions are NOT reproducible across
  *    engines (FP addition is order-sensitive). Money-like doubles in the
  *    testdata have exactly 2 decimal digits, so we route them through
  *    DecimalType for exact, order-independent aggregation, then cast the
  *    final value back to Double (a single exact decimal -> double
  *    conversion is deterministic in both Spark and DuckDB).
  *  - Every oracle query ends in a total ORDER BY (unique tie-break), with
  *    explicit NULLS FIRST/LAST in the DuckDB SQL to match Spark defaults
  *    (Spark: ASC = NULLS FIRST, DESC = NULLS LAST; DuckDB default differs).
  */
object Q {
  /** Money columns (price, balance): 2-digit scale, headroom to ~1e10. */
  val Dec: DecimalType = DecimalType(12, 2)
  /** Rate columns (discount, tax): small 2-digit-scale fractions. Kept
    * narrow so chained decimal multiplies stay exact (Spark widens the
    * product to p1+p2+1 digits and silently rounds past 38).
    */
  val Rate: DecimalType = DecimalType(4, 2)

  /** Load one testdata table (TESTDATA.md layout).
    *
    * `events.ts` is INT64 TIMESTAMP(NANOS) in the driver-generated
    * parquet, which Spark's vectorized reader rejects; we read it as
    * raw nanos (legacy conf) and surface a TIMESTAMP_NTZ at
    * microsecond precision (the actual data precision), matching
    * DuckDB's naive-timestamp semantics. Files from other writers
    * (e.g. DuckDB's, which encodes MICROS) surface `ts` as a real
    * timestamp type already — normalize those to the same
    * TIMESTAMP_NTZ so every `events` consumer sees one schema
    * regardless of the upstream writer's encoding choice.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = readMemoized(spark, s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts",
          expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
        case TimestampNTZType => df
        case _ => df.withColumn("ts", col("ts").cast(TimestampNTZType))
      }
    } else {
      readMemoized(spark, s"$dir/$name.parquet")
    }

  /** Testdata files are immutable, so path → schema is a pure function:
    * infer once per process, then pass the schema explicitly — every
    * further read of the table skips the parquet footer inference pass
    * (one driver-side job per `spark.read.parquet`; a SQL query
    * registering the whole star paid it ten times per run). Data is
    * always re-read from the files — only schema METADATA is memoized.
    */
  private val schemaMemo =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  private def readMemoized(spark: SparkSession, path: String): DataFrame = {
    val known = schemaMemo.get(path)
    if (known != null) spark.read.schema(known).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaMemo.put(path, df.schema)
      df
    }
  }

  /** Fan an UNDER-PARALLEL scan out to the session's parallelism for
    * CPU-heavy per-row pipelines (codec decode, per-shingle md5,
    * tokenizer encode). A small input (one parquet row group) plans as
    * ONE scan task, so everything up to the first exchange runs on one
    * core while the rest idle — the guide §2.5 input-skew case, with
    * "skew" = a single unsplittable split. The repartition is
    * SCALE-ADAPTIVE: it fires only when the scan has fewer partitions
    * than the session's parallelism, so a corpus big enough to fill
    * the cluster keeps its natural splits and never pays a reshuffle.
    * Results are partition-invariant for every caller (keyed
    * aggregates / joins / total-order sorts; no caller derives values
    * from partition placement).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }

  /** Exact decimal view of a 2-decimal-digit money double. */
  def money(c: Column): Column = c.cast(Dec)

  /** Order-independent exact sum of a money double, surfaced as Double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact average: exact decimal sum / count, one double division. */
  def davg(c: Column): Column =
    (sum(c.cast(Dec)).cast(DoubleType) / count(c)).cast(DoubleType)

  /** lineitem revenue term, exact: price * (1 - discount) in decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(Dec) * (lit(BigDecimal(1)).cast(Rate) - discount.cast(Rate))

  def revenueSum(price: Column, discount: Column): Column =
    sum(revenueTerm(price, discount)).cast(DoubleType)

  /** DuckDB-side equivalents (string builders keep Spark & SQL in sync). */
  object sql {
    def dsum(col: String): String =
      s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"
    def davg(col: String): String =
      s"CAST(CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE) / COUNT($col) AS DOUBLE)"
    def revenueSum(price: String = "l_extendedprice", disc: String = "l_discount"): String =
      s"CAST(SUM(CAST($price AS DECIMAL(12,2)) * (1 - CAST($disc AS DECIMAL(4,2)))) AS DOUBLE)"
  }
}
