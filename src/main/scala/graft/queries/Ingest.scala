package graft.queries

import graft.{Q, QueryModule}
import graft.ingest.RawIngest
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Oracle-gated ingest queries S1–S3 (SURVEY.md §2.1) over the reference
  * CSV fixtures (`/root/reference/datasets/`, vendored read-only at
  * `src/test/resources/datasets/`). These drive the same `RawIngest`
  * entry points the specs cover, but through the driver's DuckDB gate:
  *
  *  - s1: inferred CSV scan incl. empty-string→NULL semantics
  *    (order_items.days_since_prior_order carries 352 empty cells).
  *  - s2: the products.csv malformed-header repair — header declares 4
  *    names, rows carry 5 fields (`/root/reference/datasets/products.csv:1-2`);
  *    the oracle reproduces the repair with skip+positional columns.
  *  - s3: filename→date partition derivation per the reference's upload
  *    router regex (`/root/reference/s3_bucket.py:51`).
  *
  * Determinism notes: integer columns are surfaced as BIGINT (DuckDB's
  * CSV inference width), timestamps as TIMESTAMP_NTZ (DuckDB naive), and
  * money sums routed through DECIMAL per Q's rules.
  */
object Ingest extends QueryModule {

  /** Fixture dir — absolute so both Spark and the driver's DuckDB see
    * it, resolved from the checkout location (working directory, or the
    * `graft.fixtures.dir` system property) rather than a hard-coded
    * path so the queries survive any checkout location.
    */
  val FixtureDir: String = sys.props.get("graft.fixtures.dir").getOrElse {
    val f = new java.io.File(
      sys.props.getOrElse("user.dir", "."), "src/test/resources/datasets")
    f.getAbsolutePath
  }

  /** Positional truth for products.csv (the lying-header file) — the
    * interpretation IngestSpec validates: field 2 is the dense PK
    * 1..134 that covers every order_items.product_id (field 1 is a
    * legacy id the 4-name header omits).
    */
  val ProductsSchema: StructType = StructType(Seq(
    StructField("legacy_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("department_id", IntegerType),
    StructField("department", StringType),
    StructField("product_name", StringType)))

  /** S1: schema-inferred CSV scan with NULL derivation from empty cells. */
  def s1CsvScan(spark: SparkSession, dir: String): DataFrame =
    RawIngest.readCsvInferred(spark, s"$FixtureDir/order_items_2024-06-06.csv")
      .select(
        col("id").cast(LongType).as("id"),
        col("order_id").cast(LongType).as("order_id"),
        col("user_id").cast(LongType).as("user_id"),
        col("days_since_prior_order").cast(DoubleType).as("days_since_prior_order"),
        col("product_id").cast(LongType).as("product_id"),
        col("add_to_cart_order").cast(LongType).as("add_to_cart_order"),
        col("reordered").cast(LongType).as("reordered"),
        col("order_timestamp").cast("timestamp_ntz").as("order_ts"),
        col("date").cast(DateType).as("date"),
        col("days_since_prior_order").isNull.as("is_first_order"))
      .orderBy(col("id").asc)

  val s1Oracle: String =
    s"""SELECT CAST(id AS BIGINT) AS id, CAST(order_id AS BIGINT) AS order_id,
       |  CAST(user_id AS BIGINT) AS user_id,
       |  CAST(days_since_prior_order AS DOUBLE) AS days_since_prior_order,
       |  CAST(product_id AS BIGINT) AS product_id,
       |  CAST(add_to_cart_order AS BIGINT) AS add_to_cart_order,
       |  CAST(reordered AS BIGINT) AS reordered,
       |  order_timestamp AS order_ts, CAST(date AS DATE) AS date,
       |  days_since_prior_order IS NULL AS is_first_order
       |FROM read_csv('$FixtureDir/order_items_2024-06-06.csv')
       |ORDER BY id ASC NULLS FIRST""".stripMargin

  /** S2: malformed-header detection + positional repair. The header/data
    * field-count mismatch routes through the repair branch (asserted —
    * a silently-consistent file would make this a plain read).
    */
  def s2HeaderRepair(spark: SparkSession, dir: String): DataFrame = {
    val (df, repaired) =
      RawIngest.readCsvRepaired(spark, s"$FixtureDir/products.csv", ProductsSchema)
    require(repaired, "products.csv should trip the header-repair rule")
    df.orderBy(col("product_id").asc)
  }

  val s2Oracle: String =
    s"""SELECT legacy_id, product_id, department_id, department, product_name
       |FROM read_csv('$FixtureDir/products.csv', skip=1, header=false,
       |  columns={'legacy_id':'INTEGER','product_id':'INTEGER',
       |           'department_id':'INTEGER','department':'VARCHAR',
       |           'product_name':'VARCHAR'})
       |ORDER BY product_id ASC NULLS FIRST""".stripMargin

  /** S3: filename→partition derivation + per-day bronze rollup. The
    * derived `date` is the partition key a bronze write would use —
    * at scale this is what partition-prunes every downstream read.
    */
  def s3FilenamePartition(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read
      .option("header", true).option("inferSchema", true).option("nullValue", "")
      .csv(s"$FixtureDir/orders_2024-06-06.csv", s"$FixtureDir/orders_2024-06-07.csv")
    RawIngest.withFilenamePartition(raw)
      .groupBy(col("date").as("ingest_date"))
      .agg(
        count(lit(1)).as("n_orders"),
        Q.dsum(col("total_amount")).as("total_sales"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("ingest_date").asc)
  }

  val s3Oracle: String =
    s"""SELECT CAST(regexp_extract(filename, '(\\d{4}-\\d{2}-\\d{2})', 1) AS DATE) AS ingest_date,
       |  COUNT(*) AS n_orders,
       |  ${Q.sql.dsum("total_amount")} AS total_sales,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM read_csv(['$FixtureDir/orders_2024-06-06.csv',
       |               '$FixtureDir/orders_2024-06-07.csv'], filename=true)
       |GROUP BY 1
       |ORDER BY ingest_date ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_csv_scan" -> s1CsvScan,
    "s2_header_repair" -> s2HeaderRepair,
    "s3_filename_partition" -> s3FilenamePartition)

  override def oracles: Map[String, String] = Map(
    "s1_csv_scan" -> s1Oracle,
    "s2_header_repair" -> s2Oracle,
    "s3_filename_partition" -> s3Oracle)
}
