package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection / filter / predicate operators P1–P5 (SURVEY.md §2.2).
  *
  * Scale notes: all predicates here are pushdown-able (verified via
  * explain: PushedFilters on the parquet scan) and projections prune
  * the read schema — at 100 TB these queries read only the referenced
  * columns and skip row groups via min/max stats.
  */
object Projections extends QueryModule {

  /** P1: project / rename / reorder — narrow read schema. */
  def p1ProjectRename(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").as("qty"),
        col("l_returnflag").as("flag"))
      .orderBy(col("okey").asc, col("line_no").asc)

  val p1Oracle: String =
    """SELECT l_orderkey AS okey, l_linenumber AS line_no,
      |       l_quantity AS qty, l_returnflag AS flag
      |FROM lineitem
      |ORDER BY okey ASC NULLS FIRST, line_no ASC NULLS FIRST""".stripMargin

  /** P2: compound predicates — comparison, AND/OR, IN, BETWEEN. */
  def p2FilterPredicates(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .filter(
        col("o_orderstatus").isin("O", "F") &&
        col("o_totalprice").between(1000.0, 50000.0) &&
        (col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_orderkey").asc)

  val p2Oracle: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus IN ('O','F')
      |  AND o_totalprice BETWEEN 1000.0 AND 50000.0
      |  AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
      |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin

  /** P3: null predicates + defaulting (nulls derived via NULLIF since the
    * star tables are null-free; the reference's nullable column is
    * exercised by the ingest tests on order_items).
    */
  def p3NullHandling(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .withColumn("disc_null", nullif(col("l_discount"), lit(0.0)))
      .groupBy(col("disc_null").isNull.as("no_discount"))
      .agg(
        count(lit(1)).as("n"),
        Q.dsum(coalesce(col("disc_null"), lit(0.0)) * lit(100.0)).as("disc_pct_sum"))
      .orderBy(col("no_discount").asc)

  val p3Oracle: String =
    s"""SELECT NULLIF(l_discount, 0.0) IS NULL AS no_discount,
       |  COUNT(*) AS n,
       |  ${Q.sql.dsum("COALESCE(NULLIF(l_discount, 0.0), 0.0) * 100.0")} AS disc_pct_sum
       |FROM lineitem
       |GROUP BY 1
       |ORDER BY no_discount ASC NULLS FIRST""".stripMargin

  /** P4: LIKE / regexp predicates + regexp extraction. */
  def p4LikeRegexp(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "part")
      .filter(col("p_name").like("%bolt%") || col("p_type").startsWith("PROMO"))
      .withColumn("brand_num",
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast(IntegerType))
      .withColumn("is_promo", col("p_type").rlike("^PROMO"))
      .select("p_partkey", "p_name", "p_brand", "brand_num", "is_promo")
      .orderBy(col("p_partkey").asc)

  val p4Oracle: String =
    """SELECT p_partkey, p_name, p_brand,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
      |  regexp_matches(p_type, '^PROMO') AS is_promo
      |FROM part
      |WHERE p_name LIKE '%bolt%' OR p_type LIKE 'PROMO%'
      |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin

  /** P5: type casts — timestamp→date, double→decimal/int, int→string. */
  def p5Casts(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        col("l_shipdate").cast(DateType).as("ship_date"),
        col("l_quantity").cast(IntegerType).as("qty_int"),
        col("l_extendedprice").cast(Q.Dec).cast(DoubleType).as("price_dec"),
        col("l_orderkey").cast(StringType).as("okey_str"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)

  val p5Oracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(l_shipdate AS DATE) AS ship_date,
      |  CAST(l_quantity AS INT) AS qty_int,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
      |  CAST(l_orderkey AS VARCHAR) AS okey_str
      |FROM lineitem
      |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin

  /** P6: error-tolerant casts — try_cast surfaces malformed values as
    * NULL instead of failing the job (the ingest-hardening contract:
    * one bad cell must not kill a 100 TB backfill). Valid, invalid,
    * and empty inputs each exercised.
    */
  def p6TryCast(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "part")
      .filter(col("p_partkey") < 300)
      .select(
        col("p_partkey"),
        expr("try_cast(p_brand AS INT)").as("brand_as_int"), // 'Brand#13' → NULL
        expr("try_cast(regexp_extract(p_brand, '(\\\\d+)', 1) AS INT)")
          .as("brand_num"), // digits → value
        expr("try_cast('' AS INT)").as("empty_int"), // '' → NULL
        expr("try_cast(CAST(p_size AS STRING) AS INT)").as("size_roundtrip"))
      .orderBy(col("p_partkey").asc)

  val p6Oracle: String =
    """SELECT p_partkey,
      |  TRY_CAST(p_brand AS INT) AS brand_as_int,
      |  TRY_CAST(regexp_extract(p_brand, '(\d+)', 1) AS INT) AS brand_num,
      |  TRY_CAST('' AS INT) AS empty_int,
      |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS size_roundtrip
      |FROM part
      |WHERE p_partkey < 300
      |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_project_rename" -> p1ProjectRename,
    "p2_filter_predicates" -> p2FilterPredicates,
    "p3_null_handling" -> p3NullHandling,
    "p4_like_regexp" -> p4LikeRegexp,
    "p5_casts" -> p5Casts,
    "p6_try_cast" -> p6TryCast)

  override def oracles: Map[String, String] = Map(
    "p1_project_rename" -> p1Oracle,
    "p2_filter_predicates" -> p2Oracle,
    "p3_null_handling" -> p3Oracle,
    "p4_like_regexp" -> p4Oracle,
    "p5_casts" -> p5Oracle,
    "p6_try_cast" -> p6Oracle)
}
