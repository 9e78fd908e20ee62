package graft

import org.apache.spark.sql.functions._

/** A3: approx_count_distinct must track the exact count within its
  * configured relative standard deviation (generous 3×rsd bound).
  */
class ApproxDistinctSpec extends SparkTestBase {
  quiet()

  test("approx distinct within tolerance of exact") {
    val li = Q.t(spark, sf, "lineitem")
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.05).as("approx")).head()
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact <= 0.15,
      s"approx=$approx exact=$exact")
  }

  test("a3 query rows match group count") {
    val res = SparkEntry.queries("a3_approx_distinct")(spark, sf)
    val flags = Q.t(spark, sf, "lineitem").select("l_returnflag").distinct().count()
    assert(res.count() === flags)
  }

  test("A11: HLL sketch rollup is accurate and union-lossless") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("a11_sketch_rollup")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toMap
    // per-group estimates within 5% of exact
    rows.filterNot(_._1 == "TOTAL").foreach { case (g, (approx, exact)) =>
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"group $g: approx=$approx exact=$exact")
    }
    // union of per-group sketches == one sketch over everything:
    // HLL registers max-merge, so pre-grouping loses nothing
    val direct = Q.t(spark, sf, "orders")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))")
        .cast("long")).first().getLong(0)
    assert(rows("TOTAL")._1 === direct)
    val exactTotal = Q.t(spark, sf, "orders")
      .select(countDistinct(col("o_custkey"))).first().getLong(0)
    assert(math.abs(rows("TOTAL")._1 - exactTotal) <= (exactTotal * 0.05).toLong)
  }

  test("A7b: approx_percentile tracks exact percentiles per group") {
    val approx = SparkEntry.queries("a7_percentile_approx")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Q.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.25)").as("p25"),
        expr("percentile(l_extendedprice, 0.75)").as("p75"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (flag, (p50, p25, p75)) =>
      val (a50, a25, a75) = approx(flag)
      // GK sketch with accuracy 10000 → rank error ≤ 1e-4; prices span
      // ~[900, 105k], so a generous 2% value bound holds with margin
      assert(math.abs(a50 - p50) / p50 <= 0.02, s"$flag median: $a50 vs $p50")
      assert(math.abs(a25 - p25) / p25 <= 0.02, s"$flag q1: $a25 vs $p25")
      assert(math.abs(a75 - p75) / p75 <= 0.02, s"$flag q3: $a75 vs $p75")
    }
  }

  test("FN7: sketch-union WAU tracks the exact fn6 counts per report cell") {
    import org.apache.spark.sql.functions.col
    val exact = graft.queries.Analytics.fn6Wau(spark, sf)
      .select(col("event_type"), col("day"), col("wau")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    val approx = graft.queries.Analytics.fn7WauSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2)).toMap
    assert(approx.keySet === exact.keySet, "report cells must align")
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / math.max(e, 1) <= 0.05,
        s"cell $k: approx $a vs exact $e")
    }
  }
}
