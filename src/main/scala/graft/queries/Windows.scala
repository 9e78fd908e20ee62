package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window operators W1–W4 (SURVEY.md §2.5).
  *
  * Scale notes: each window is partitioned on a real key (brand, day,
  * customer) so state never concentrates on one task; window orderings
  * are total (unique tie-break column) — required both for determinism
  * and so range-based frames don't degenerate. Running sums over money
  * stay in DecimalType inside the frame (exact) and surface as Double.
  */
object Windows extends QueryModule {

  /** W1: ranking — top-3 parts by revenue within each brand. */
  def w1RankTopN(spark: SparkSession, dir: String): DataFrame = {
    val l = Q.t(spark, dir, "lineitem")
    val p = Q.t(spark, dir, "part").select("p_partkey", "p_brand")
    val rev = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
    // brand is ~25 values while parts scale with the corpus — but a
    // constant-k rank filter is the one low-cardinality-window shape
    // Spark already distributes natively: InferWindowGroupLimit plans
    // a PARTIAL per-input-partition top-3 before the exchange, so the
    // final per-brand sort sees ≤ 3·(map tasks) rows, never the raw
    // frame (plan-asserted in PlanShapeSpec)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("revenue").desc, col("p_partkey").asc)
    rev.withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand").asc, col("rn").asc)
  }

  val w1Oracle: String =
    s"""WITH rev AS (
       |  SELECT p_brand, p_partkey, ${Q.sql.revenueSum()} AS revenue
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY p_brand, p_partkey)
       |SELECT * FROM (
       |  SELECT p_brand, p_partkey, revenue,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
       |      ORDER BY revenue DESC NULLS LAST, p_partkey ASC NULLS FIRST) AS INT) AS rn,
       |    CAST(RANK() OVER (PARTITION BY p_brand
       |      ORDER BY revenue DESC NULLS LAST, p_partkey ASC NULLS FIRST) AS INT) AS rnk
       |  FROM rev) t
       |WHERE rn <= 3
       |ORDER BY p_brand ASC NULLS FIRST, rn ASC NULLS FIRST""".stripMargin

  /** W2: lag/lead — day-over-day revenue delta. Daily sums stay decimal
    * until after the lag so the delta is exact.
    */
  def w2LagLead(spark: SparkSession, dir: String): DataFrame = {
    val daily = Q.t(spark, dir, "orders")
      .groupBy(col("o_orderdate").cast(DateType).as("day"))
      .agg(sum(col("o_totalprice").cast(Q.Dec)).as("rev_dec"))
    val w = Window.orderBy(col("day").asc)
    daily
      .withColumn("prev_rev", lag(col("rev_dec"), 1).over(w))
      .withColumn("next_rev", lead(col("rev_dec"), 1).over(w))
      .select(
        col("day"),
        col("rev_dec").cast(DoubleType).as("revenue"),
        col("prev_rev").cast(DoubleType).as("prev_revenue"),
        (col("rev_dec") - col("prev_rev")).cast(DoubleType).as("delta"),
        col("next_rev").cast(DoubleType).as("next_revenue"))
      .orderBy(col("day").asc)
  }

  val w2Oracle: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_dec
      |  FROM orders GROUP BY 1)
      |SELECT day,
      |  CAST(rev_dec AS DOUBLE) AS revenue,
      |  CAST(LAG(rev_dec, 1) OVER (ORDER BY day ASC NULLS FIRST) AS DOUBLE) AS prev_revenue,
      |  CAST(rev_dec - LAG(rev_dec, 1) OVER (ORDER BY day ASC NULLS FIRST) AS DOUBLE) AS delta,
      |  CAST(LEAD(rev_dec, 1) OVER (ORDER BY day ASC NULLS FIRST) AS DOUBLE) AS next_revenue
      |FROM daily
      |ORDER BY day ASC NULLS FIRST""".stripMargin

  /** W3: frame-spec running + sliding aggregates per customer. */
  def w3RunningFrames(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast(Q.Dec).as("price_dec"))
    val base = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sliding = base.rowsBetween(-2, Window.currentRow)
    o.select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("price_dec")).over(running).cast(DoubleType).as("running_spend"),
        (sum(col("price_dec")).over(sliding).cast(DoubleType) /
          count(lit(1)).over(sliding)).as("moving_avg_3"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  val w3Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w_run AS DOUBLE) AS running_spend,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w_slide AS DOUBLE)
      |    / COUNT(*) OVER w_slide AS moving_avg_3
      |FROM orders
      |WHERE o_custkey < 50
      |WINDOW
      |  w_run AS (PARTITION BY o_custkey
      |    ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  w_slide AS (PARTITION BY o_custkey
      |    ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin

  /** W4: ntile / percent_rank / cume_dist — customer value quartiles.
    *
    * NOT a `Window.orderBy(...)` global window: that plans an Exchange
    * to a SINGLE partition and sorts every customer in one task. Under
    * a total order with a unique tiebreak, all three functions are
    * pure expressions of (rn, n): rank = rn (no peers), percent_rank =
    * (rn-1)/(n-1), cume_dist = rn/n, and ntile is the standard
    * first-(n mod k)-tiles-get-one-extra integer split. rn comes from
    * the distributed two-pass prefix count ([[graft.operators
    * .PrefixSum]], range-imaged by floor(-acctbal) — monotone along
    * the descending balance order); n is one broadcast scalar. The
    * divisions are the same exact-integer-to-double ops the window
    * functions perform, so results are bit-identical.
    */
  def w4Ntile(spark: SparkSession, dir: String): DataFrame = {
    val base = Q.t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    // range image ordered like `c_acctbal DESC NULLS LAST`: NaN is the
    // Spark-greatest double (sorts FIRST under desc) → explicit least
    // sentinel; ±Infinity clamp keeps floor(-x) inside the sentinel
    // band; null → null image, bucketed LAST via nullImageLast. The
    // sentinels only stretch the probed range when such rows exist.
    val image = when(isnan(col("c_acctbal")), lit(-4000000000000000000L))
      .otherwise(least(greatest(floor(-col("c_acctbal")), lit(-2.0e18)),
        lit(2.0e18)).cast("long"))
    val ranked = graft.operators.PrefixSum.rowNumber(base, Nil,
      Seq(col("c_acctbal").desc, col("c_custkey").asc),
      image, "rn", nullImageLast = true)
    val nDf = base.agg(count(lit(1)).as("n"))
    val k = 4
    ranked.crossJoin(broadcast(nDf))
      .withColumn("_q", expr(s"n div $k"))
      .withColumn("_r", expr(s"n % $k"))
      .withColumn("value_quartile",
        when(col("rn") <= col("_r") * (col("_q") + 1),
          expr("(rn - 1) div (_q + 1)") + 1)
          .otherwise(col("_r") +
            expr("(rn - 1 - _r * (_q + 1)) div _q") + 1)
          .cast("int"))
      .withColumn("pct_rank",
        when(col("n") === 1, lit(0.0)).otherwise(
          (col("rn") - 1).cast("double") / (col("n") - 1).cast("double")))
      .withColumn("cume",
        col("rn").cast("double") / col("n").cast("double"))
      .select(col("c_custkey"), col("c_acctbal"),
        col("value_quartile"), col("pct_rank"), col("cume"))
      .orderBy(col("c_custkey").asc)
  }

  val w4Oracle: String =
    """SELECT c_custkey, c_acctbal,
      |  CAST(NTILE(4) OVER w AS INT) AS value_quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM customer
      |WINDOW w AS (ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS FIRST)
      |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin

  /** W5: first_value / last_value / nth_value over full-partition
    * frames — first, latest, and second order per customer.
    */
  def w5FirstLastNth(spark: SparkSession, dir: String): DataFrame = {
    val base = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Q.t(spark, dir, "orders")
      .filter(col("o_custkey") < 30)
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(full).as("first_price"),
        last(col("o_totalprice")).over(full).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  val w5Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |  FIRST_VALUE(o_totalprice) OVER w AS first_price,
      |  LAST_VALUE(o_totalprice) OVER w AS last_price,
      |  NTH_VALUE(o_totalprice, 2) OVER w AS second_price
      |FROM orders
      |WHERE o_custkey < 30
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey ASC NULLS FIRST, o_orderkey ASC NULLS FIRST""".stripMargin

  /** W6: LOCF forward-fill — last non-null observation carried forward
    * per user (`last(..., ignoreNulls)` over a running frame): the
    * standard sensor/time-series gap repair. One window shuffle on the
    * user key; the frame scan is incremental, not quadratic.
    */
  def w6Locf(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Q.t(spark, dir, "events")
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"), col("value"),
        last(col("value"), ignoreNulls = true).over(w).as("value_filled"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  val w6Oracle: String =
    """SELECT user_id, event_id, value,
      |  last_value(value IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
      |FROM events
      |WHERE user_id < 50
      |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_rank_topn" -> w1RankTopN,
    "w2_lag_lead" -> w2LagLead,
    "w3_running_frames" -> w3RunningFrames,
    "w4_ntile" -> w4Ntile,
    "w5_first_last_nth" -> w5FirstLastNth,
    "w6_locf" -> w6Locf)

  override def oracles: Map[String, String] = Map(
    "w1_rank_topn" -> w1Oracle,
    "w2_lag_lead" -> w2Oracle,
    "w3_running_frames" -> w3Oracle,
    "w4_ntile" -> w4Oracle,
    "w5_first_last_nth" -> w5Oracle,
    "w6_locf" -> w6Oracle)
}
