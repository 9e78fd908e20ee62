package graft

import graft.functions.Sketches
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitters sketch (A12): exact when capacity covers
  * the domain, bounded undercount in the sketchy regime, and merge-
  * invariant across partitionings (the mergeable-summaries contract).
  */
class SketchSpec extends SparkTestBase {
  quiet()

  private def hhMap(df: org.apache.spark.sql.DataFrame, col0: String,
      k: Int): Map[String, Long] = {
    val hh = Sketches.heavyHitters(k)
    df.agg(hh(col(col0)).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e._1"), col("e._2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("exact regime: capacity ≥ domain gives exact counts under any partitioning") {
    val o = Q.t(spark, sf, "orders")
    val expected = o.filter(col("o_orderstatus").isNotNull)
      .groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // force many partial buffers and merges: results must be identical
    for (parts <- Seq(1, 16)) {
      val got = hhMap(o.repartition(parts), "o_orderstatus", 16)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("sketchy regime: undercount bound holds, planted heavy hitter survives") {
    // 9,000 tail rows over 3,000 keys (~3 each) + 3,000 of one hot key
    val tail = spark.range(9000)
      .select((col("id") % 3000).cast("string").as("k"))
    val hot = spark.range(3000).select(lit("HOT").as("k"))
    val df = tail.unionByName(hot).repartition(16)
    val n = 12000L
    val k = 32
    val bound = n / (k + 1) + 1 // n/(k+1), integer slack
    val got = hhMap(df, "k", k)
    assert(got.size <= k)
    // the guarantee: any key with true count > n/(k+1) is present
    assert(got.contains("HOT"), s"true heavy hitter dropped: $got")
    // every estimate undercounts by at most n/(k+1)
    got.foreach { case (key, est) =>
      val truth = if (key == "HOT") 3000L else 3L
      assert(est <= truth, s"$key overcounted: $est > $truth")
      assert(truth - est <= bound,
        s"$key undercounted past the bound: $truth - $est > $bound")
    }
  }

  test("NULLs don't count; empty input yields an empty summary") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None, Some("b")).toDF("k")
    val got = hhMap(df, "k", 4)
    assert(got === Map("a" -> 2L, "b" -> 1L))
    val empty = hhMap(df.filter(col("k") === "zzz"), "k", 4)
    assert(empty === Map.empty[String, Long])
  }

  test("a13: KLL quantile rollup tracks exact percentiles; union ≡ global sketch") {
    val out = SparkEntry.queries("a13_quantile_rollup")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    val o = Q.t(spark, sf, "orders")
    val statuses = out.keySet - "TOTAL"
    assert(statuses.nonEmpty)

    // per-group sketch quantiles within 5% RELATIVE RANK of exact: the
    // KLL guarantee is on rank error, so compare by checking the
    // sketch's answer sits between the exact 45th and 55th (resp.
    // 90th/99th) percentiles of the group
    def exactQ(df: org.apache.spark.sql.DataFrame, q: Double): Double =
      df.stat.approxQuantile("o_totalprice", Array(q), 0.0).head
    statuses.foreach { s =>
      val grp = o.filter(col("o_orderstatus") === s)
      val (n, p50, p95) = out(s)
      assert(n === grp.count())
      assert(p50 >= exactQ(grp, 0.45) && p50 <= exactQ(grp, 0.55), s"$s p50")
      assert(p95 >= exactQ(grp, 0.90) && p95 <= exactQ(grp, 0.99), s"$s p95")
    }
    // TOTAL row: union of group sketches tracks the GLOBAL distribution
    val (tn, tp50, tp95) = out("TOTAL")
    assert(tn === o.count())
    assert(tp50 >= exactQ(o, 0.45) && tp50 <= exactQ(o, 0.55), "total p50")
    assert(tp95 >= exactQ(o, 0.90) && tp95 <= exactQ(o, 0.99), "total p95")
  }
}
