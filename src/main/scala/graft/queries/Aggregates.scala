package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators A1–A7 (SURVEY.md §2.4) over the testdata star.
  *
  * Scale notes: every groupBy here hash-aggregates with automatic
  * partial (map-side) + final phases; group cardinalities are bounded
  * (flags, status, brand, date) so the shuffle carries only partial
  * states, not rows. countDistinct expands — bounded here by group
  * count × distinct keys; at 100 TB prefer a2's exact form only on
  * bounded keys and approx_count_distinct (A3, unit-tested, tolerance)
  * elsewhere.
  */
object Aggregates extends QueryModule {

  /** A1: TPC-H-Q1-shaped pricing summary — partial+final hash agg.
    * fanOut (guide §2.5): the per-row decimal-exact arithmetic is the
    * dominant cost and a one-row-group lineitem scan is one task
    * (measured 1.55 s single-task vs ~0.3 s fanned out); every
    * aggregate here is decimal/count, i.e. order-insensitive.
    */
  def a1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Q.fanOut(Q.t(spark, dir, "lineitem"))
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Q.dsum(col("l_quantity")).as("sum_qty"),
        Q.dsum(col("l_extendedprice")).as("sum_base_price"),
        Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        sum(Q.revenueTerm(col("l_extendedprice"), col("l_discount")) *
            (lit(BigDecimal(1)).cast(Q.Rate) + col("l_tax").cast(Q.Rate)))
          .cast(DoubleType).as("sum_charge"),
        Q.davg(col("l_quantity")).as("avg_qty"),
        Q.davg(col("l_extendedprice")).as("avg_price"),
        Q.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  val a1Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Q.sql.dsum("l_quantity")} AS sum_qty,
       |  ${Q.sql.dsum("l_extendedprice")} AS sum_base_price,
       |  ${Q.sql.revenueSum()} AS sum_disc_price,
       |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       |  ${Q.sql.davg("l_quantity")} AS avg_qty,
       |  ${Q.sql.davg("l_extendedprice")} AS avg_price,
       |  ${Q.sql.davg("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** A2: exact COUNT DISTINCT per group (two-phase expand automatic). */
  def a2CountDistinct(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc)

  val a2Oracle: String =
    """SELECT o_orderstatus,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  COUNT(DISTINCT o_orderpriority) AS n_priorities,
      |  COUNT(*) AS n_orders
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin

  /** A3: approximate distinct (HyperLogLog++) — the 100-TB-scale path
    * beside A2's exact form. No DuckDB oracle (approximation differs
    * by engine); accuracy is asserted by ApproxDistinctSpec (rsd 5%).
    */
  def a3ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), 0.05).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.05).as("approx_parts"))
      .orderBy(col("l_returnflag").asc)

  /** A4: ROLLUP with grouping_id — multi-grain gold rollup. */
  def a4Rollup(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        Q.dsum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid").asc, col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val a4Oracle: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  ${Q.sql.dsum("o_totalprice")} AS total_price,
       |  COUNT(*) AS n,
       |  GROUPING(o_orderstatus, o_orderpriority) AS gid
       |FROM orders
       |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
       |ORDER BY gid ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST,
       |  o_orderpriority ASC NULLS FIRST""".stripMargin

  /** A4b: CUBE — all 2^k grouping combinations with grouping_id. */
  def a4Cube(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        Q.dsum(col("o_totalprice")).as("total_price"),
        count(lit(1)).as("n"),
        grouping_id().as("gid"))
      .orderBy(col("gid").asc, col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val a4CubeOracle: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  ${Q.sql.dsum("o_totalprice")} AS total_price,
       |  COUNT(*) AS n,
       |  GROUPING(o_orderstatus, o_orderpriority) AS gid
       |FROM orders
       |GROUP BY CUBE (o_orderstatus, o_orderpriority)
       |ORDER BY gid ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST,
       |  o_orderpriority ASC NULLS FIRST""".stripMargin

  /** A5: filtered/conditional aggregation — promo revenue share style. */
  def a5ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Q.t(spark, dir, "lineitem")
    val part = Q.t(spark, dir, "part").select("p_partkey", "p_type", "p_brand")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("p_type") === "PROMO",
          Q.revenueTerm(col("l_extendedprice"), col("l_discount")))
          .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 4))))
          .cast(DoubleType).as("promo_revenue"),
        Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"),
        count(when(col("l_quantity") >= 25, lit(1))).as("n_bulk_lines"))
      .orderBy(col("p_brand").asc)
  }

  val a5Oracle: String =
    s"""SELECT p_brand,
       |  CAST(SUM(CASE WHEN p_type = 'PROMO'
       |       THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
       |       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
       |  ${Q.sql.revenueSum()} AS total_revenue,
       |  COUNT(CASE WHEN l_quantity >= 25 THEN 1 END) AS n_bulk_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY p_brand ASC NULLS FIRST""".stripMargin

  /** A6: array agg — per-order sorted basket of parts. The arrays are
    * serialized to CSV strings in the final projection (the driver's
    * pandas comparator cannot hash array cells); collect_list/collect_set
    * + sort_array remain the operators under test.
    */
  def a6CollectList(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(sort_array(collect_list(col("l_partkey")))
          .cast(ArrayType(StringType)), ",").as("basket"),
        array_join(sort_array(collect_set(col("l_returnflag"))), ",").as("flags"))
      .orderBy(col("l_orderkey").asc)

  val a6Oracle: String =
    """SELECT l_orderkey,
      |  array_to_string(list_sort(list(l_partkey)), ',') AS basket,
      |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
      |FROM lineitem
      |WHERE l_orderkey < 100
      |GROUP BY l_orderkey
      |ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin

  /** A7: exact percentiles — l_quantity is integral so linear
    * interpolation at quartiles is FP-exact in both engines.
    */
  def a7Percentiles(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        expr("percentile(l_quantity, 0.25)").as("q1_qty"),
        expr("percentile(l_quantity, 0.75)").as("q3_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag").asc)

  val a7Oracle: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.25) AS q1_qty,
      |  quantile_cont(l_quantity, 0.75) AS q3_qty,
      |  MIN(l_quantity) AS min_qty,
      |  MAX(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin

  /** A7b: approximate percentiles (GK sketch) — the 100-TB path beside
    * A7's exact form: mergeable partial sketches, no global sort, error
    * bounded by `accuracy`. Engine-specific sketch → no DuckDB oracle
    * (rows-only check); ApproxDistinctSpec asserts tolerance vs exact.
    */
  def a7PercentileApprox(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("median_price"),
        expr("approx_percentile(l_extendedprice, array(0.25, 0.75), 10000)")
          .getItem(0).as("q1_price"),
        expr("approx_percentile(l_extendedprice, array(0.25, 0.75), 10000)")
          .getItem(1).as("q3_price"))
      .orderBy(col("l_returnflag").asc)

  /** A9: HAVING — post-aggregation predicate (TPC-H-Q18-flavored:
    * large-basket orders only).
    */
  def a9Having(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(Q.dsum(col("l_quantity")).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 100.0)
      .orderBy(col("l_orderkey").asc)

  val a9Oracle: String =
    s"""SELECT l_orderkey, ${Q.sql.dsum("l_quantity")} AS total_qty,
       |  COUNT(*) AS n_lines
       |FROM lineitem
       |GROUP BY l_orderkey
       |HAVING ${Q.sql.dsum("l_quantity")} > 100.0
       |ORDER BY l_orderkey ASC NULLS FIRST""".stripMargin

  /** A8b: descriptive statistics (variance / stddev / correlation /
    * covariance) computed from DECIMAL sufficient statistics — NOT the
    * built-in streaming `stddev`/`corr` aggregates, whose FP
    * accumulation order varies with partitioning (not reproducible
    * across engines or cluster sizes). Exact decimal sums of x, y, x²,
    * y², xy are partial-aggregatable (one map-side-combined shuffle —
    * THE single-pass distributed formula at 100 TB), and the closing
    * scalar formula over exact inputs is deterministic FP. Prices have
    * 2-digit scale → squares have 4-digit scale → sums are exact.
    */
  def a8DescriptiveStats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_extendedprice").cast(Q.Dec)
    val y = col("l_quantity").cast(Q.Dec)
    Q.t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * x).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"),
        sum(x * y).cast(DoubleType).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        // closing formulas rounded (s1/d5 pattern): the inputs are
        // exact decimal sums, but `a*b - c*d` in double can differ by
        // one ulp across engines (FMA contraction); 6–8 decimals is
        // far above ulp noise and far below anything meaningful.
        // Degenerate groups are guarded EXPLICITLY (n=1 → no sample
        // variance; zero variance → no correlation): Spark's x/0
        // yields NULL while DuckDB's IEEE division yields inf/NaN, so
        // leaving the divide-by-zero implicit would diverge.
        round(col("sx") / col("n"), 6).as("mean_price"),
        when(col("n") > 1,
          round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 2))
          .as("var_price"),
        when(col("n") > 1,
          round(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 4))
          .as("std_price"),
        when(col("n") > 1,
          round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 4))
          .as("cov_price_qty"),
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
          col("n") * col("syy") - col("sy") * col("sy") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 8))
          .as("corr_price_qty"))
      .orderBy(col("l_returnflag").asc)
  }

  val a8Oracle: String = {
    val dx = "CAST(l_extendedprice AS DECIMAL(12,2))"
    val dy = "CAST(l_quantity AS DECIMAL(12,2))"
    s"""SELECT l_returnflag, n, round(sx / n, 6) AS mean_price,
       |  CASE WHEN n > 1
       |    THEN round((sxx - sx * sx / n) / (n - 1), 2) END AS var_price,
       |  CASE WHEN n > 1
       |    THEN round(sqrt((sxx - sx * sx / n) / (n - 1)), 4) END AS std_price,
       |  CASE WHEN n > 1
       |    THEN round((sxy - sx * sy / n) / (n - 1), 4) END AS cov_price_qty,
       |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
       |    THEN round((n * sxy - sx * sy) /
       |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 8)
       |  END AS corr_price_qty
       |FROM (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    CAST(SUM($dx) AS DOUBLE) AS sx,
       |    CAST(SUM($dy) AS DOUBLE) AS sy,
       |    CAST(SUM($dx * $dx) AS DOUBLE) AS sxx,
       |    CAST(SUM($dy * $dy) AS DOUBLE) AS syy,
       |    CAST(SUM($dx * $dy) AS DOUBLE) AS sxy
       |  FROM lineitem GROUP BY l_returnflag)
       |ORDER BY l_returnflag ASC NULLS FIRST""".stripMargin
  }

  /** A11: mergeable sketch rollup (Apache DataSketches HLL) — per-group
    * distinct-count sketches UNIONED into coarser grains without
    * rescanning the data: the pattern behind re-aggregatable gold
    * rollups at 100 TB (store sketches per partition/day; any coarser
    * distinct count is a sketch union, O(groups), not a table scan).
    * Engine-specific binary → rows-only check; ApproxDistinctSpec
    * asserts accuracy AND that union-of-group-sketches ≡ one global
    * sketch (HLL registers are max-merged, so grouping is lossless).
    */
  def a11SketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    val sketches = o.groupBy(col("o_orderstatus"))
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"),
        countDistinct(col("o_custkey")).as("exact"))
    val perStatus = sketches.select(col("o_orderstatus"),
      expr("hll_sketch_estimate(sk)").cast("long").as("approx_customers"),
      col("exact"))
    // grand total WITHOUT touching orders again: union the group sketches
    val total = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").cast("long")
        .as("approx_customers"))
      .select(lit("TOTAL").as("o_orderstatus"), col("approx_customers"),
        lit(null).cast("long").as("exact"))
    perStatus.unionByName(total).orderBy(col("o_orderstatus").asc)
  }

  /** A13: mergeable QUANTILE sketch rollup (KLL — Karnin/Lang/Liberty
    * FOCS'16, Spark's DataSketches integration) — the a11 pattern for
    * percentiles: per-group KLL sketches, then the grand-total p50/p95
    * from a sketch UNION, never rescanning the table. This is how a
    * 100 TB metrics store serves "p95 by region AND global p95" from
    * one pass + O(groups) merge work. Sketch binaries are
    * engine-specific → rows-only gate; SketchSpec bounds the error
    * against exact percentiles.
    */
  def a13QuantileRollup(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    val sketches = o.groupBy(col("o_orderstatus"))
      .agg(expr("kll_sketch_agg_double(o_totalprice)").as("sk"),
        count(lit(1)).as("n"))
    val perStatus = sketches.select(col("o_orderstatus"), col("n"),
      expr("kll_sketch_get_quantile_double(sk, 0.5)").as("p50"),
      expr("kll_sketch_get_quantile_double(sk, 0.95)").as("p95"))
    val total = sketches
      .agg(expr("kll_merge_agg_double(sk)").as("sk"), sum(col("n")).as("n"))
      .select(lit("TOTAL").as("o_orderstatus"), col("n"),
        expr("kll_sketch_get_quantile_double(sk, 0.5)").as("p50"),
        expr("kll_sketch_get_quantile_double(sk, 0.95)").as("p95"))
    perStatus.unionByName(total).orderBy(col("o_orderstatus").asc)
  }

  /** A13b: EXACT quantiles as order statistics — the smallest value
    * whose inclusive rank ≥ ⌈q·n⌉, per group and globally, selected by
    * rank windows: the same integer rank math as the DuckDB oracle,
    * so values match bit for bit (and ties are value-stable — MIN over
    * ranks ≥ r is independent of row_number order among equal values).
    * This used to ride the KLL sketch "in its exact regime", but a
    * KLL compacts past ~k items and the gated slice outgrew k at
    * sf0.1 (p50 drifted 1%) — exactness by construction beats
    * exactness by assumption. The per-group sort is the honest cost
    * of exact quantiles; the KLL rollup above ([[a13QuantileRollup]],
    * SketchSpec error-bounded) is the one-pass mergeable path a
    * 100 TB metrics store actually serves from.
    */
  def a13QuantileExact(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders").filter(col("o_orderkey") % 101 === 0)
      .select(col("o_orderstatus"), col("o_totalprice"))
    // NOT a row_number window: o_orderstatus has 3 values (plus one
    // GLOBAL rank), so the window form sorts the whole sampled frame
    // in single tasks at scale. Exact ranks reduce to prefix COUNTS
    // over the price order: min price with rn ≥ t ⟺ min price whose
    // cumulative count ≥ t (row numbers within a tied-price group are
    // consecutive, and the aggregate is tie-insensitive). So: reduce
    // to (status, price) grain — map-side combined — then the
    // distributed two-pass prefix sum of the counts, then one tiny
    // threshold aggregate. Bit-identical to the window form.
    val grain = o.groupBy(col("o_orderstatus"), col("o_totalprice"))
      .agg(count(lit(1)).as("c"))
    // statsOf = the RAW single-column projection: the grain's price
    // range IS the raw range, and probing the grain frame would
    // re-execute the aggregate (the stats-probe-over-derived-lineage
    // trap) — a columnar min/max over raw orders is far cheaper
    val priceStats = Q.t(spark, dir, "orders").select(col("o_totalprice"))
    def quantiles(df: DataFrame, parts: Seq[String]): DataFrame = {
      val cum = graft.operators.PrefixSum.exclusive(
        df, parts, "o_totalprice", Seq("c" -> "cum0"),
        statsOf = Some(priceStats))
      val nDf =
        if (parts.isEmpty) df.agg(sum(col("c")).as("n"))
        else df.groupBy(parts.map(col): _*).agg(sum(col("c")).as("n"))
          .select(parts.map(c => col(c).as(s"_n_$c")) :+ col("n"): _*)
      // null-safe: a null status is its own group under window
      // semantics, so its count row must match too
      val joined =
        if (parts.isEmpty) cum.crossJoin(broadcast(nDf))
        else cum.join(broadcast(nDf),
          parts.map(c => col(c) <=> col(s"_n_$c")).reduce(_ && _))
      val keyCols =
        if (parts.isEmpty) Seq(lit("TOTAL").as("o_orderstatus"))
        else parts.map(col)
      joined
        .withColumn("cin", col("cum0") + col("c"))
        .groupBy(keyCols: _*)
        .agg(max(col("n")).as("n"),
          min(when(col("cin") >= ceil(lit(0.5) * col("n")),
            col("o_totalprice"))).as("p50"),
          min(when(col("cin") >= ceil(lit(0.95) * col("n")),
            col("o_totalprice"))).as("p95"))
    }
    val per = quantiles(grain, Seq("o_orderstatus"))
    val tot = quantiles(
      grain.groupBy(col("o_totalprice")).agg(sum(col("c")).as("c")), Nil)
    per.unionByName(tot)
      .select(col("o_orderstatus"), col("n"), col("p50"), col("p95"))
      .orderBy(col("o_orderstatus").asc)
  }

  val a13ExactOracle: String =
    """WITH o AS (
      |  SELECT o_orderstatus, o_totalprice FROM orders
      |  WHERE o_orderkey % 101 = 0),
      |ranked AS (
      |  SELECT o_orderstatus, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      |  FROM o),
      |per AS (
      |  SELECT o_orderstatus, MAX(n) AS n,
      |    MIN(CASE WHEN rn >= CEIL(0.5 * n) THEN o_totalprice END) AS p50,
      |    MIN(CASE WHEN rn >= CEIL(0.95 * n) THEN o_totalprice END) AS p95
      |  FROM ranked GROUP BY 1),
      |rankedT AS (
      |  SELECT o_totalprice,
      |    ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM o),
      |tot AS (
      |  SELECT 'TOTAL' AS o_orderstatus, MAX(n) AS n,
      |    MIN(CASE WHEN rn >= CEIL(0.5 * n) THEN o_totalprice END) AS p50,
      |    MIN(CASE WHEN rn >= CEIL(0.95 * n) THEN o_totalprice END) AS p95
      |  FROM rankedT)
      |SELECT * FROM per
      |UNION ALL
      |SELECT * FROM tot
      |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin

  /** A12: heavy hitters via the Misra-Gries mergeable sketch (typed
    * UDAF, `functions/Sketches.scala`). Capacity 16 ≥ the status
    * domain, so no decrement fires and the sketch is provably EXACT —
    * which is what lets DuckDB's GROUP BY act as the oracle. The
    * approximate regime (capacity ≪ cardinality, the 100 TB vocab
    * case) is spec-gated in SketchSpec with the n/(k+1) bound.
    */
  def a12HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val hh = graft.functions.Sketches.heavyHitters(16)
    Q.t(spark, dir, "orders")
      .agg(hh(col("o_orderstatus")).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1").as("item"), col("e._2").as("cnt"))
      .orderBy(col("cnt").desc, col("item").asc)
  }

  val a12Oracle: String =
    """SELECT o_orderstatus AS item, COUNT(*) AS cnt
      |FROM orders WHERE o_orderstatus IS NOT NULL
      |GROUP BY 1
      |ORDER BY cnt DESC NULLS LAST, item ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a12_heavy_hitters" -> a12HeavyHitters,
    "a1_pricing_summary" -> a1PricingSummary,
    "a2_count_distinct" -> a2CountDistinct,
    "a3_approx_distinct" -> a3ApproxDistinct,
    "a4_rollup" -> a4Rollup,
    "a4_cube" -> a4Cube,
    "a5_conditional_agg" -> a5ConditionalAgg,
    "a6_collect_list" -> a6CollectList,
    "a7_percentiles" -> a7Percentiles,
    "a7_percentile_approx" -> a7PercentileApprox,
    "a8_descriptive_stats" -> a8DescriptiveStats,
    "a9_having" -> a9Having,
    "a11_sketch_rollup" -> a11SketchRollup,
    "a13_quantile_rollup" -> a13QuantileRollup,
    "a13_quantile_exact" -> a13QuantileExact)

  override def oracles: Map[String, String] = Map(
    "a12_heavy_hitters" -> a12Oracle,
    "a13_quantile_exact" -> a13ExactOracle,
    "a1_pricing_summary" -> a1Oracle,
    "a2_count_distinct" -> a2Oracle,
    "a4_rollup" -> a4Oracle,
    "a4_cube" -> a4CubeOracle,
    "a5_conditional_agg" -> a5Oracle,
    "a6_collect_list" -> a6Oracle,
    "a7_percentiles" -> a7Oracle,
    "a8_descriptive_stats" -> a8Oracle,
    "a9_having" -> a9Oracle)
}
