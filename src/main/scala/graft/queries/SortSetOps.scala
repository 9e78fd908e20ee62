package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort / limit / top-k (O1–O2) and set operations (U1–U3),
  * SURVEY.md §2.6–2.7.
  *
  * Scale notes: O1 is a range-partitioned global sort (samples key
  * distribution, no single-reducer bottleneck); O2 compiles to
  * TakeOrderedAndProject — per-partition heaps, only k rows move.
  * Set ops are shuffle-based; UNION ALL is a no-shuffle concat.
  */
object SortSetOps extends QueryModule {

  /** O1: global sort — total ordering via unique tie-break. */
  def o1GlobalSort(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  val o1Oracle: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST""".stripMargin

  /** O2: top-k without a full sort (TakeOrderedAndProject). */
  def o2TopK(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)

  val o2Oracle: String =
    """SELECT o_orderkey, o_orderdate, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      |LIMIT 25""".stripMargin

  /** U1: UNION ALL — multi-slice append then aggregate. */
  def u1UnionAll(spark: SparkSession, dir: String): DataFrame = {
    val l = Q.t(spark, dir, "lineitem")
    val bulk = l.filter(col("l_quantity") >= 45)
    val tiny = l.filter(col("l_quantity") <= 5)
    bulk.unionByName(tiny)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag").asc)
  }

  val u1Oracle: String =
    s"""SELECT l_returnflag, COUNT(*) AS n, ${Q.sql.dsum("l_quantity")} AS qty
       |FROM (SELECT * FROM lineitem WHERE l_quantity >= 45
       |      UNION ALL
       |      SELECT * FROM lineitem WHERE l_quantity <= 5)
       |GROUP BY l_returnflag
       |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin

  /** U2: UNION (distinct) — deduplicating union of key sets. */
  def u2UnionDistinct(spark: SparkSession, dir: String): DataFrame = {
    val active = Q.t(spark, dir, "orders").select(col("o_custkey").as("custkey"))
    val wealthy = Q.t(spark, dir, "customer")
      .filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("custkey"))
    active.union(wealthy).distinct()
      .orderBy(col("custkey").asc)
  }

  val u2Oracle: String =
    """SELECT o_custkey AS custkey FROM orders
      |UNION
      |SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
      |ORDER BY custkey ASC NULLS FIRST""".stripMargin

  /** U3a: INTERSECT — customers with both completed and open orders. */
  def u3Intersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey").asc)
  }

  val u3IntersectOracle: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin

  /** U3b: EXCEPT — customers with completed but no open orders. */
  def u3Except(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey").asc)
  }

  val u3ExceptOracle: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin

  /** U4a: EXCEPT ALL — multiset difference (each occurrence counts):
    * order keys minus one copy per matching high-value key. The
    * bag-semantics forms complete the set-op family; Spark plans both
    * as aggregate-on-count, one shuffle.
    */
  def u4ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    o.select(col("o_custkey"))
      .exceptAll(o.filter(col("o_totalprice") > 300000.0).select(col("o_custkey")))
      .orderBy(col("o_custkey").asc)
  }

  val u4ExceptAllOracle: String =
    """SELECT o_custkey FROM orders
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin

  /** U4b: INTERSECT ALL — multiset intersection (min of occurrence
    * counts per key across the two order-status bags).
    */
  def u4IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .intersectAll(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      .orderBy(col("o_custkey").asc)
  }

  val u4IntersectAllOracle: String =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o1_global_sort" -> o1GlobalSort,
    "o2_topk" -> o2TopK,
    "u1_union_all" -> u1UnionAll,
    "u2_union_distinct" -> u2UnionDistinct,
    "u3_intersect" -> u3Intersect,
    "u3_except" -> u3Except,
    "u4_except_all" -> u4ExceptAll,
    "u4_intersect_all" -> u4IntersectAll)

  override def oracles: Map[String, String] = Map(
    "o1_global_sort" -> o1Oracle,
    "o2_topk" -> o2Oracle,
    "u1_union_all" -> u1Oracle,
    "u2_union_distinct" -> u2Oracle,
    "u3_intersect" -> u3IntersectOracle,
    "u3_except" -> u3ExceptOracle,
    "u4_except_all" -> u4ExceptAllOracle,
    "u4_intersect_all" -> u4IntersectAllOracle)
}
