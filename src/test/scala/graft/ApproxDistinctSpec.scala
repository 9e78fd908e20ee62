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
}
