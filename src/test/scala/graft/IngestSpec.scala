package graft

import graft.ingest.RawIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1–S3 against the reference's own CSVs (copied fixtures, see
  * FIXTURES.md §A): inference, null handling, malformed-header repair,
  * filename→partition derivation, bronze write.
  */
class IngestSpec extends SparkTestBase {
  quiet()

  val fixtures: String = getClass.getResource("/datasets").getPath

  val productsPositional: StructType = StructType(Seq(
    StructField("legacy_id", IntegerType),
    StructField("product_id", IntegerType),
    StructField("department_id", IntegerType),
    StructField("department", StringType),
    StructField("product_name", StringType)))

  test("S1: orders inference — row count and types") {
    val df = RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-06.csv")
    assert(df.count() === 2248)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("order_id") === IntegerType)
    assert(types("total_amount") === DoubleType)
    assert(types("order_timestamp") === TimestampType ||
           types("order_timestamp") === TimestampNTZType)
  }

  test("S1: empty strings surface as NULLs (days_since_prior_order)") {
    val df = RawIngest.readCsvInferred(spark, s"$fixtures/order_items_2024-06-06.csv")
    assert(df.count() === 6655)
    assert(df.filter(col("days_since_prior_order").isNull).count() === 352)
  }

  test("S2: products header mismatch is detected (4 names, 5 fields)") {
    val (h, d) = RawIngest.headerFieldCounts(spark, s"$fixtures/products.csv")
    assert(h === 4)
    assert(d === 5)
  }

  test("S2: consistent files are NOT flagged") {
    val (h, d) = RawIngest.headerFieldCounts(spark, s"$fixtures/orders_2024-06-06.csv")
    assert(h === d)
  }

  test("S2: positional repair yields the true product key") {
    val (df, repaired) =
      RawIngest.readCsvRepaired(spark, s"$fixtures/products.csv", productsPositional)
    assert(repaired)
    assert(df.count() === 134)
    // repaired product_id is the dense PK 1..134
    val keys = df.agg(min("product_id"), max("product_id"),
      countDistinct("product_id")).head()
    assert(keys.getInt(0) === 1)
    assert(keys.getInt(1) === 134)
    assert(keys.getLong(2) === 134L)
  }

  test("S2: repaired key covers every order_items.product_id (RI)") {
    val (products, _) =
      RawIngest.readCsvRepaired(spark, s"$fixtures/products.csv", productsPositional)
    val items = RawIngest.readCsvInferred(spark, s"$fixtures/order_items_2024-06-06.csv")
    val orphans = items.select("product_id").distinct()
      .join(products, Seq("product_id"), "left_anti").count()
    assert(orphans === 0)
  }

  test("S3: routing rule mirrors the reference router") {
    assert(RawIngest.route("orders_2024-06-06.csv") === "transactional/orders")
    assert(RawIngest.route("order_items_2024-06-06.csv") === "transactional/order_items")
    assert(RawIngest.route("products.csv") === "product")
    assert(RawIngest.route("readme.txt") === "misc")
  }

  test("S3: partition date derived from filename") {
    val df = RawIngest.withFilenamePartition(
      RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-06.csv"))
    val dates = df.select("date").distinct().collect().map(_.getDate(0).toString)
    assert(dates.toSeq === Seq("2024-06-06"))
  }

  test("S3/S5: multi-day bronze ingest is partitioned and complete") {
    val bronze = s"${sys.props("java.io.tmpdir")}/graft_test_bronze"
    val out = RawIngest.ingestToBronze(spark,
      s"$fixtures/orders_2024-06-0[67].csv", bronze)
    assert(out.count() === 2248 + 2222)
    assert(out.select("date").distinct().count() === 2)
    // hive-style partition dirs on disk
    val dirs = new java.io.File(bronze).list().filter(_.startsWith("date="))
    assert(dirs.sorted.toSeq === Seq("date=2024-06-06", "date=2024-06-07"))
  }
}
