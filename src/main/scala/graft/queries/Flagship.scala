package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Flagship: TPC-H-Q3-shaped revenue top-10 over the testdata star
  * (SURVEY.md §7 Phase 0). Exercises parquet scan w/ pushdown (S4),
  * filters (P2), shuffle join + broadcast dim join (J1/J2/J5), hash
  * aggregate (A1) and top-k (O2).
  *
  * Scale notes: customer is filtered then broadcast (bounded dim at any
  * SF once filtered by segment? no — customer scales; we broadcast only
  * under the threshold and otherwise let AQE decide: no explicit
  * broadcast hint on customer at 100 TB. The aggregate is partial+final
  * (automatic), top-10 via TakeOrderedAndProject — no global sort.
  */
object Flagship extends QueryModule {

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-01"
    val customer = Q.t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val orders = Q.t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = Q.t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")

    lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val flagshipOracle: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |       ${Q.sql.revenueSum()} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-06-01'
       |  AND l_shipdate > TIMESTAMP '1998-06-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC NULLS LAST, l_orderkey ASC NULLS FIRST
       |LIMIT 10""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("flagship_q3_topk" -> ((s, d) => flagship(s, d)))

  override def oracles: Map[String, String] =
    Map("flagship_q3_topk" -> flagshipOracle)
}
