package graft

import graft.lake.ManifestTable
import graft.sql.GraftNames
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One table-address vocabulary (GraftNames): the `CALL graft.*`
  * procedures and the `graft-table` streaming source accept catalog
  * names (`cat.ns.table`) wherever they accept a filesystem root, and
  * a dotted name that resolves through nothing fails loudly instead of
  * silently becoming a relative path.
  */
class GraftNamesSpec extends SparkTestBase {
  quiet()

  lazy val sqlSpark: SparkSession = extensionsSession("graft-names")

  private val lakeRoot =
    s"${sys.props("java.io.tmpdir")}/graft_names_lake_${System.nanoTime()}"

  override def withFixture(test: NoArgTest) = {
    Seq(spark, sqlSpark).foreach { s =>
      s.conf.set("spark.sql.catalog.gname_spec", "graft.sql.GraftCatalog")
      s.conf.set("spark.sql.catalog.gname_spec.root", lakeRoot)
    }
    super.withFixture(test)
  }

  private lazy val setup: Unit = {
    import spark.implicits._
    val orders = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "A", 30.0))
      .toDF("order_id", "status", "amount")
    new ManifestTable(spark, s"$lakeRoot/silver/orders")
      .write(orders, "overwrite") // v0
  }

  test("resolveRoot: paths pass through verbatim, names resolve") {
    setup
    assert(GraftNames.resolveRoot(spark, "/x/y.z") === "/x/y.z")
    assert(GraftNames.resolveRoot(spark, "reldir") === "reldir")
    assert(GraftNames.resolveRoot(spark, "gname_spec.silver.orders")
      === s"$lakeRoot/silver/orders")
    // a dotted name that names no registered catalog refuses — it must
    // never silently create a relative-path table named "nope.silver…"
    val e = intercept[IllegalArgumentException] {
      GraftNames.resolveRoot(spark, "nope.silver.orders")
    }
    assert(messageChain(e).contains("not a registered catalog"))
    // a registered catalog of a different kind refuses too
    val e2 = intercept[IllegalArgumentException] {
      GraftNames.resolveRoot(spark, "spark_catalog.default.t")
    }
    assert(messageChain(e2).contains("not a graft.sql.GraftCatalog"))
    // a name that resolves but names no table fails with the catalog's
    // own no-such-table error
    intercept[Exception] {
      GraftNames.resolveRoot(spark, "gname_spec.silver.missing")
    }
    // malformed dotted addresses refuse with guidance, not a raw
    // crash — and a MULTI-segment trailing dot must not silently
    // collapse to a different table ('cat.ns.' ↛ root-level 'ns')
    Seq("gname_spec.", "gname_spec.silver.", "gname_spec..orders")
      .foreach { bad =>
        val eM = intercept[IllegalArgumentException] {
          GraftNames.resolveRoot(spark, bad)
        }
        assert(messageChain(eM).contains("malformed table name"), bad)
      }
    // bare-dot path values pass the ambiguity guard verbatim
    assert(GraftNames.requireUnambiguousPath(spark, ".") === ".")
    // the path-only guard: a slash-less dotted 'root' that names a
    // registered graft catalog is ambiguous and refuses with guidance
    // (a plain relative dotted path passes through)
    val e3 = intercept[IllegalArgumentException] {
      spark.readStream
        .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
        .option("root", "gname_spec.silver.orders")
        .load()
    }
    assert(messageChain(e3).contains("ambiguous"))
    assert(GraftNames.requireUnambiguousPath(spark, "events.v2")
      === "events.v2")
  }

  test("CALL procedures accept catalog names (maintenance ≡ by-root)") {
    setup
    // history by name sees the same commits as by root
    val byName = sqlSpark.sql(
      "CALL graft.describe_history('gname_spec.silver.orders')")
    val byRoot = sqlSpark.sql(
      s"CALL graft.describe_history('$lakeRoot/silver/orders')")
    assert(byName.collect().toSeq === byRoot.collect().toSeq)
    // a mutation issued by name lands in the same governed table
    sqlSpark.sql(
      "CALL graft.update('gname_spec.silver.orders', " +
        "'order_id = 2', 'amount = 99.0')")
    val got = sqlSpark.sql(
      "SELECT amount FROM gname_spec.silver.orders WHERE order_id = 2")
      .collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(99.0))
    // and OPTIMIZE by name commits a new version
    val v = sqlSpark.sql("CALL graft.optimize('gname_spec.silver.orders', 1)")
      .collect().head.getInt(0)
    assert(v >= 2)
  }

  test("graft-table stream source tails a table by catalog name") {
    setup
    import graft.streaming.GraftTableSourceProvider
    val outDir = s"$lakeRoot/_out_stream"
    val ckpt = s"$lakeRoot/_ckpt_stream"
    def drain(): Unit = spark.readStream
      .format(classOf[GraftTableSourceProvider].getName)
      .option("table", "gname_spec.silver.orders")
      .load()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    drain()
    val base = spark.read.parquet(outDir).count()
    assert(base === spark.table("gname_spec.silver.orders").count())
    // an append committed BY NAME flows through the name-addressed tail
    spark.sql(
      "INSERT INTO gname_spec.silver.orders VALUES (7, 'D', 70.0)")
    drain()
    assert(spark.read.parquet(outDir).count() === base + 1)
  }
}
