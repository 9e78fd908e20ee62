package graft

import graft.ingest.RawIngest
import graft.meta.DataQuality
import org.apache.spark.sql.types._

/** DQ rules against the reference fixtures: the invariants SURVEY.md
  * §1.3 documents must hold post-ingest (and the checks must actually
  * catch violations when planted).
  */
class DataQualitySpec extends SparkTestBase {
  quiet()

  val fixtures: String = getClass.getResource("/datasets").getPath

  private lazy val orders =
    RawIngest.readCsvInferred(spark, s"$fixtures/orders_2024-06-06.csv")
  private lazy val items =
    RawIngest.readCsvInferred(spark, s"$fixtures/order_items_2024-06-06.csv")
  private lazy val products = RawIngest.readCsvRepaired(
    spark, s"$fixtures/products.csv", StructType(Seq(
      StructField("legacy_id", IntegerType),
      StructField("product_id", IntegerType),
      StructField("department_id", IntegerType),
      StructField("department", StringType),
      StructField("product_name", StringType))))._1

  test("reference invariants hold: RI, uniqueness, ranges, null budget") {
    val checks = Seq(
      DataQuality.referentialIntegrity(items, orders, "order_id"),
      DataQuality.referentialIntegrity(items, products, "product_id"),
      DataQuality.unique(orders, "order_id"),
      DataQuality.valueRange(orders, "total_amount", 5.0, 50.0),
      DataQuality.nullRate(items, "days_since_prior_order", 0.10))
    checks.foreach(c => assert(c.passed, s"${c.check}: ${c.detail}"))
    val rep = DataQuality.report(spark, checks)
    assert(rep.count() === 5)
  }

  test("checks catch planted violations") {
    // un-repaired products (header-shifted key) must FAIL RI
    val broken = RawIngest.readCsvInferred(spark, s"$fixtures/products.csv")
    val ri = DataQuality.referentialIntegrity(items, broken, "product_id")
    assert(!ri.passed)
    assert(ri.violations > 100)

    // doubled orders must fail uniqueness
    val doubled = orders.unionByName(orders)
    assert(!DataQuality.unique(doubled, "order_id").passed)

    // tight range must fail
    assert(!DataQuality.valueRange(orders, "total_amount", 5.0, 10.0).passed)

    // zero null budget must fail on the nullable column
    assert(!DataQuality.nullRate(items, "days_since_prior_order", 0.0).passed)
  }
}
