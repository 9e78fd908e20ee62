package graft.pipeline

import graft.ingest.RawIngest
import graft.lake.ManifestTable
import graft.meta.SchemaRegistry
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed silver row for orders — the conformance contract as a case
  * class (SURVEY.md §1.1: typed Dataset where a fixed schema is the
  * point). Money is BigDecimal at silver for exact arithmetic.
  */
case class SilverOrder(
    order_num: Int,
    order_id: Int,
    user_id: Int,
    order_timestamp: java.sql.Timestamp,
    total_amount: BigDecimal,
    date: java.sql.Date)

/** The reference's end-to-end surface as one pipeline (SURVEY.md §3
  * E1+E2): raw CSVs → bronze (typed append, partition-derived, schema
  * registered) → silver (conformed, header-repaired dims, CDC-merged
  * facts) → gold (aggregate rollups). Each zone is a ManifestTable —
  * versioned, time-travelable, compactable.
  *
  * Scale notes: bronze/silver facts are date-partitioned (partition
  * pruning + partition-scoped merge); the products dim is tiny and
  * broadcast into gold joins; every gold output is a partial+final
  * hash aggregate.
  */
class Medallion(spark: SparkSession, lakeRoot: String) {

  val registry = new SchemaRegistry(spark, s"$lakeRoot/_registry")

  val productsPositional: StructType = StructType(Seq(
    StructField("legacy_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("department_id", IntegerType),
    StructField("department", StringType),
    StructField("product_name", StringType)))

  def bronzeTable(name: String): ManifestTable =
    new ManifestTable(spark, s"$lakeRoot/bronze-zone/$name", Some("date"))
  def silverTable(name: String, partitioned: Boolean = true): ManifestTable =
    new ManifestTable(spark, s"$lakeRoot/silver-zone/$name",
      if (partitioned) Some("date") else None)
  def goldTable(name: String): ManifestTable =
    new ManifestTable(spark, s"$lakeRoot/gold-zone/$name", None)

  /** Raw → bronze: inferred read, filename partition, schema
    * registered under the evolution policy, appended to the bronze
    * manifest table.
    */
  def ingestBronze(name: String, rawGlob: String): ManifestTable = {
    val df = RawIngest.withFilenamePartition(
      RawIngest.readCsvInferred(spark, rawGlob))
    registry.register(s"bronze_$name", df.schema)
    val t = bronzeTable(name)
    t.write(df, "append")
    t
  }

  /** Bronze → silver orders: typed conformance (money as
    * DECIMAL(10,2)) + CDC merge of correction feeds by order_id.
    */
  def conformOrders(bronze: ManifestTable): ManifestTable = {
    // _src_file lineage stays in bronze; silver is conformed business
    // data (otherwise every CDC row "changes" by provenance alone)
    val typed = bronze.read()
      .drop("_src_file")
      .withColumn("total_amount", col("total_amount").cast(DecimalType(10, 2)))
    val t = silverTable("orders")
    t.write(typed, "overwrite")
    t
  }

  /** Typed view of silver orders: compile-time field checks for
    * downstream code (the DataFrame remains the storage form).
    */
  def typedOrders(silver: ManifestTable): Dataset[SilverOrder] = {
    import spark.implicits._
    silver.read()
      .select(col("order_num").cast(IntegerType), col("order_id").cast(IntegerType),
        col("user_id").cast(IntegerType),
        col("order_timestamp").cast(TimestampType),
        col("total_amount").cast(DecimalType(10, 2)),
        col("date").cast(DateType))
      .as[SilverOrder]
  }

  /** Apply a CDC correction feed (same raw schema) into silver. */
  def applyOrdersCdc(silver: ManifestTable, feedCsv: String): Int = {
    val feed = RawIngest.withFilenamePartition(
        RawIngest.readCsvInferred(spark, feedCsv))
      .drop("_src_file")
      .withColumn("total_amount", col("total_amount").cast(DecimalType(10, 2)))
    silver.merge(feed, Seq("order_id"))
  }

  /** Raw → silver products: header-repaired positional read (the
    * malformed-header dim), exact-deduped by PK.
    */
  def conformProducts(rawCsv: String): ManifestTable = {
    val (df, _) = RawIngest.readCsvRepaired(spark, rawCsv, productsPositional)
    val t = silverTable("products", partitioned = false)
    t.write(df.dropDuplicates("product_id"), "overwrite")
    t
  }

  /** Silver → gold: daily revenue + department rollup. */
  def buildGold(orders: ManifestTable, items: ManifestTable,
      products: ManifestTable): (ManifestTable, ManifestTable) = {
    val dailyRevenue = orders.read()
      .groupBy(col("date"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("total_amount")).as("revenue"),
        countDistinct(col("user_id")).as("n_users"))
    val g1 = goldTable("daily_revenue")
    g1.write(dailyRevenue, "overwrite")

    val deptRollup = items.read()
      .join(broadcast(products.read()), Seq("product_id"))
      .groupBy(col("date"), col("department"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("reordered")).as("n_reorders"))
    val g2 = goldTable("dept_rollup")
    g2.write(deptRollup, "overwrite")
    (g1, g2)
  }
}
