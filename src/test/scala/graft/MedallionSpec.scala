package graft

import graft.meta.Catalog
import graft.pipeline.Medallion
import org.apache.spark.sql.functions._

/** End-to-end medallion flow over the reference's own CSVs: raw →
  * bronze (2 daily partitions) → silver (typed + CDC merge + repaired
  * dim) → gold rollups; plus S6 catalog registration/listing.
  */
class MedallionSpec extends SparkTestBase {
  quiet()

  val fixtures: String = getClass.getResource("/datasets").getPath

  private def freshLake(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_lake_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  test("raw→bronze→silver→gold end to end on the reference datasets") {
    val lake = freshLake("e2e")
    val m = new Medallion(spark, lake)

    // bronze: both daily orders files + both order_items files
    val bronzeOrders = m.ingestBronze("orders", s"$fixtures/orders_2024-06-0[67].csv")
    val bronzeItems = m.ingestBronze("order_items", s"$fixtures/order_items_2024-06-0[67].csv")
    assert(bronzeOrders.read().count() === 2248 + 2222)
    assert(bronzeOrders.read().select("date").distinct().count() === 2)
    assert(m.registry.tables.contains("bronze_orders"))

    // silver: typed orders + CDC merge; repaired products
    val silverOrders = m.conformOrders(bronzeOrders)
    val preMerge = silverOrders.latestVersion.get
    m.applyOrdersCdc(silverOrders, s"$fixtures/orders_2024-06-06-Updated.csv")
    val postMerge = silverOrders.latestVersion.get
    assert(postMerge === preMerge + 1)
    // exactly 8 rows changed, and time travel still shows the old state
    assert(silverOrders.read(Some(postMerge))
      .exceptAll(silverOrders.read(Some(preMerge))).count() === 8)
    // re-applying the feed is a no-op version-wise
    m.applyOrdersCdc(silverOrders, s"$fixtures/orders_2024-06-06-Updated.csv")
    assert(silverOrders.latestVersion.get === postMerge)

    val silverItems = m.silverTable("order_items")
    silverItems.write(bronzeItems.read(), "overwrite")
    val silverProducts = m.conformProducts(s"$fixtures/products.csv")
    assert(silverProducts.read().count() === 134)

    // gold
    val (daily, dept) = m.buildGold(silverOrders, silverItems, silverProducts)
    val d = daily.read()
    assert(d.count() === 2)
    assert(d.agg(sum("n_orders")).head().getLong(0) === 2248 + 2222)
    val dd = dept.read()
    assert(dd.count() > 2)
    // every item lands in a department (repaired join covers 100%)
    assert(dd.agg(sum("n_items")).head().getLong(0) === 6655 + 6754)
  }

  test("silver DQ gate: CHECK constraint rejects a corrupting CDC feed end-to-end") {
    import org.apache.spark.sql.DataFrame
    val lake = freshLake("dq_gate")
    val m = new Medallion(spark, lake)
    val bronze = m.ingestBronze("orders", s"$fixtures/orders_2024-06-06.csv")
    val silver = m.conformOrders(bronze)
    // governance: silver amounts must be non-negative — registered
    // once, enforced by EVERY later writer on the table
    silver.addConstraint("amount_non_negative", "total_amount >= 0")
    val good = m.applyOrdersCdc(silver,
      s"$fixtures/orders_2024-06-06-Updated.csv") // clean feed merges
    assert(good >= 1)
    // a corrupting feed (negative amount) must be rejected atomically
    val vBefore = silver.latestVersion.get
    val bad: DataFrame = silver.read().limit(1)
      .withColumn("total_amount",
        lit(BigDecimal(-5)).cast(org.apache.spark.sql.types.DecimalType(10, 2)))
    val ex = intercept[Exception] { silver.merge(bad, Seq("order_id")) }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(msgs.contains("amount_non_negative"), msgs.take(500))
    assert(silver.latestVersion.get === vBefore, "bad feed must not commit")
    assert(silver.read().filter(col("total_amount") < 0).count() === 0)
  }

  test("typed silver Dataset: case-class conformance + typed ops") {
    val lake = freshLake("typed")
    val m = new Medallion(spark, lake)
    val bronze = m.ingestBronze("orders", s"$fixtures/orders_2024-06-06.csv")
    val silver = m.conformOrders(bronze)
    val ds = m.typedOrders(silver)
    import spark.implicits._
    // typed transformations with compile-time field access
    val perUser = ds.groupByKey(_.user_id)
      .mapGroups((u, rows) => (u, rows.map(_.total_amount).sum))
    assert(ds.count() === 2248)
    assert(perUser.count() === ds.map(_.user_id).distinct().count())
  }

  test("S6: catalog registration + crawler-style names + listing") {
    val lake = freshLake("catalog")
    val cat = new Catalog(spark, lake)
    assert(cat.tableName("transactional/orders") === "transactional_orders")
    assert(cat.tableName("product") === "product_product")
    val df = Q.t(spark, sf, "region")
    cat.register("gold", "transactional/orders", df)
    assert(cat.listTables().contains("transactional_orders"))
    assert(spark.table(s"retail_lakehouse_db.transactional_orders").count() === df.count())
  }
}
