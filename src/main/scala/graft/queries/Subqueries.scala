package graft.queries

import graft.{GraftSession, Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery forms + multi-grain grouping via the SQL surface —
  * exercises Catalyst's RewriteCorrelatedScalarSubquery decorrelation
  * (SURVEY.md §4) and GROUPING SETS expansion. Written as SQL strings
  * (Spark SQL is the parser); decimal-routing discipline applies in
  * both dialects identically.
  */
object Subqueries extends QueryModule {

  /** TPC-H-Q17-shaped: lines below 20% of their part's average
    * quantity — correlated scalar subquery, decorrelated by Catalyst
    * into a join against a per-part aggregate (one shuffle, no
    * per-row re-execution).
    */
  private val sub1Sql =
    """SELECT p_brand,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
      |  COUNT(*) AS n_small_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_quantity < (
      |  SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
      |  FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand
      |ORDER BY p_brand ASC NULLS FIRST""".stripMargin

  def sub1CorrelatedScalar(spark: SparkSession, dir: String): DataFrame =
    GraftSession.sql(spark, dir, sub1Sql)

  /** Uncorrelated scalar + IN subquery: orders above the global mean
    * price from customers in a segment subquery.
    */
  private val sub2Sql =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (
      |    SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin

  def sub2ScalarIn(spark: SparkSession, dir: String): DataFrame =
    GraftSession.sql(spark, dir, sub2Sql)

  /** Correlated EXISTS / NOT EXISTS — Catalyst rewrites both into
    * semi/anti joins (one shuffle each, no per-row subquery
    * re-execution); same SQL is the DuckDB oracle.
    */
  private val sub3Sql =
    """SELECT c_custkey, c_mktsegment
      |FROM customer
      |WHERE EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin

  def sub3Exists(spark: SparkSession, dir: String): DataFrame =
    GraftSession.sql(spark, dir, sub3Sql)

  /** GROUPING SETS — explicit multi-grain aggregate (A4's general
    * form beyond ROLLUP).
    */
  private val gsSpark =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  def a4GroupingSets(spark: SparkSession, dir: String): DataFrame =
    GraftSession.sql(spark, dir, gsSpark)

  /** LATERAL join — per-row correlated derived table (top-2 orders per
    * customer). Catalyst plans the correlated limit as a ranked window
    * over one join, not per-row re-execution — the same
    * decorrelation story as sub1/sub3.
    */
  private val sub4Sql =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |    SELECT o_orderkey, o_totalprice FROM orders
      |    WHERE o_custkey = c.c_custkey
      |    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      |    LIMIT 2) t
      |WHERE c.c_custkey < 50
      |ORDER BY c_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin

  def sub4Lateral(spark: SparkSession, dir: String): DataFrame =
    GraftSession.sql(spark, dir, sub4Sql)

  /** SUB5: RECURSIVE CTE (Spark 4's WITH RECURSIVE) — walk each
    * customer's order chain (first order → next by date) emitting the
    * hop number: the linked-list/hierarchy traversal shape (org
    * charts, BOM explosions, referral chains) that was THE reason to
    * leave Spark before 4.0. Iterations = longest chain; each step is
    * one equi-join of the frontier against the next-pointer table —
    * the same per-round shape as the CC engines, planned by the
    * engine itself.
    */
  private val sub5Sql =
    """WITH RECURSIVE nxt AS (
      |  SELECT o_custkey, o_orderkey,
      |    LEAD(o_orderkey) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
      |      AS next_key
      |  FROM orders WHERE o_custkey < 100),
      |chain AS (
      |  SELECT o_custkey, o_orderkey, 1 AS hop FROM (
      |    SELECT o_custkey, o_orderkey,
      |      ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
      |        AS rn
      |    FROM orders WHERE o_custkey < 100) f
      |  WHERE rn = 1
      |  UNION ALL
      |  SELECT x.o_custkey, x.next_key AS o_orderkey, c.hop + 1 AS hop
      |  FROM chain c JOIN nxt x
      |    ON x.o_custkey = c.o_custkey AND x.o_orderkey = c.o_orderkey
      |  WHERE x.next_key IS NOT NULL)
      |SELECT o_custkey, o_orderkey, hop FROM chain
      |ORDER BY o_custkey ASC NULLS FIRST, hop ASC NULLS FIRST""".stripMargin

  def sub5Recursive(spark: SparkSession, dir: String): DataFrame = {
    // Same result as sub5Sql (the oracle), different plan: Spark's
    // recursive-CTE loop re-evaluates the recursion body per hop, so
    // the successor relation (scan + window) is computed ONCE into a
    // cached view and each iteration pays only the hop join against
    // it — depth × O(join) instead of depth × O(scan + sort).
    GraftSession.registerStar(spark, dir)
    val nxt = spark.sql(
      """SELECT o_custkey, o_orderkey,
        |  LEAD(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
        |    AS next_key,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST)
        |    AS rn
        |FROM orders WHERE o_custkey < 100""".stripMargin).cache()
    nxt.count() // materialize before the loop starts
    nxt.createOrReplaceTempView("sub5_nxt")
    spark.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT o_custkey, o_orderkey, 1 AS hop
        |  FROM sub5_nxt WHERE rn = 1
        |  UNION ALL
        |  SELECT /*+ BROADCAST(x) */
        |    x.o_custkey, x.next_key AS o_orderkey, c.hop + 1 AS hop
        |  FROM chain c JOIN sub5_nxt x
        |    ON x.o_custkey = c.o_custkey AND x.o_orderkey = c.o_orderkey
        |  WHERE x.next_key IS NOT NULL)
        |SELECT o_custkey, o_orderkey, hop FROM chain
        |ORDER BY o_custkey ASC NULLS FIRST, hop ASC NULLS FIRST""".stripMargin)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sub5_recursive" -> sub5Recursive,
    "sub1_correlated_scalar" -> sub1CorrelatedScalar,
    "sub2_scalar_in" -> sub2ScalarIn,
    "sub3_exists" -> sub3Exists,
    "sub4_lateral" -> sub4Lateral,
    "a4_grouping_sets" -> a4GroupingSets)

  // the Spark SQL strings are (deliberately) also valid DuckDB SQL
  override def oracles: Map[String, String] = Map(
    "sub5_recursive" -> sub5Sql,
    "sub1_correlated_scalar" -> sub1Sql,
    "sub2_scalar_in" -> sub2Sql,
    "sub3_exists" -> sub3Sql,
    "sub4_lateral" -> sub4Sql,
    "a4_grouping_sets" -> gsSpark)
}
