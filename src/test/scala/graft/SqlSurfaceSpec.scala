package graft

import graft.ingest.RawIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL-string surface (Spark SQL as the parser) + corrupt-record
  * quarantine.
  */
class SqlSurfaceSpec extends SparkTestBase {
  quiet()

  test("full SQL dialect over registered star views") {
    val df = GraftSession.sql(spark, sf,
      """SELECT l_returnflag, count(*) AS n,
        |       sum(cast(l_quantity AS decimal(12,2))) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(df.count() > 0)
    assert(df.columns.toSeq === Seq("l_returnflag", "n", "qty"))
    // window + CTE dialect
    val w = GraftSession.sql(spark, sf,
      """WITH t AS (SELECT o_custkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) rn
        |  FROM orders)
        |SELECT * FROM t WHERE rn = 1""".stripMargin)
    assert(w.count() === Q.t(spark, sf, "orders").select("o_custkey").distinct().count())
  }

  test("heavy-hitters UDAF is callable from plain SQL") {
    graft.functions.Sketches.registerHeavyHitters(spark, k = 16)
    Q.t(spark, sf, "orders").createOrReplaceTempView("sql_hh_orders")
    val got = spark.sql(
      """SELECT e._1 AS item, e._2 AS cnt
        |FROM (SELECT explode(graft_heavy_hitters(o_orderstatus)) AS e
        |      FROM sql_hh_orders)
        |ORDER BY cnt DESC, item""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Q.t(spark, sf, "orders")
      .filter(col("o_orderstatus").isNotNull)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected, "capacity ≥ domain ⇒ SQL call is exact")
  }

  test("quarantine splits malformed rows without losing good ones") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_quarantine"
    new java.io.File(dir).mkdirs()
    val f = new java.io.File(dir, "mixed.csv")
    val w = new java.io.PrintWriter(f)
    w.println("id,amount,ts")
    w.println("1,10.5,2024-06-06 10:00:00")
    w.println("2,not_a_number,2024-06-06 11:00:00") // corrupt: bad double
    w.println("3,30.25,2024-06-06 12:00:00")
    w.close()

    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("amount", DoubleType),
      StructField("ts", TimestampType)))
    val (good, bad) = RawIngest.readCsvWithQuarantine(spark, f.getPath, schema)
    assert(good.count() === 2)
    assert(good.agg(sum("amount")).head().getDouble(0) === 40.75)
    assert(bad.count() === 1)
    assert(bad.head().getString(0).contains("not_a_number"))
  }

  test("quarantine on a clean reference file quarantines nothing") {
    val fixtures = getClass.getResource("/datasets").getPath
    val schema = StructType(Seq(
      StructField("order_num", IntegerType),
      StructField("order_id", IntegerType),
      StructField("user_id", IntegerType),
      StructField("order_timestamp", TimestampType),
      StructField("total_amount", DoubleType),
      StructField("date", DateType)))
    val (good, bad) = RawIngest.readCsvWithQuarantine(
      spark, s"$fixtures/orders_2024-06-06.csv", schema)
    assert(good.count() === 2248)
    assert(bad.count() === 0)
  }
}
