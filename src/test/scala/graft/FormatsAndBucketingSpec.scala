package graft

import org.apache.spark.sql.functions._

/** Additional source/sink formats (JSON lines, ORC, CSV write-back)
  * and bucketed tables — the co-located-join path: two tables bucketed
  * on the join key join WITHOUT any shuffle exchange (the technique
  * that replaces fact⋈fact shuffles at 100 TB).
  */
class FormatsAndBucketingSpec extends SparkTestBase {
  quiet()

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_fmt_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  test("JSON lines roundtrip preserves rows and schema-on-read works") {
    val dir = scratch("json")
    val orders = Q.t(spark, sf, "orders")
    orders.write.json(dir)
    val back = spark.read.json(dir)
    assert(back.count() === orders.count())
    // JSON infers strings/longs; keyed totals must still agree
    val a = orders.agg(sum(col("o_totalprice").cast("decimal(12,2)"))).head().getDecimal(0)
    val b = back.agg(sum(col("o_totalprice").cast("decimal(12,2)"))).head().getDecimal(0)
    assert(a === b)
  }

  test("ORC roundtrip preserves rows and types") {
    val dir = scratch("orc")
    val li = Q.t(spark, sf, "lineitem")
    li.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === li.count())
    assert(back.schema === li.schema)
    assert(back.exceptAll(li).count() === 0)
  }

  test("CSV write-back with header re-reads identically (typed)") {
    val dir = scratch("csv")
    val region = Q.t(spark, sf, "region")
    region.write.option("header", true).csv(dir)
    val back = spark.read.option("header", true)
      .schema(region.schema).csv(dir)
    assert(back.exceptAll(region).count() === 0)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a previously crashed run can leave the managed location behind
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    Q.t(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Q.t(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      // count only the executed (final) plan, not AQE's initial plan
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      plan.split("\n").count(_.contains("Exchange hashpartitioning"))
    }
    // disable auto-broadcast: at test SF everything broadcasts, which
    // would hide the bucket co-location being asserted
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).count()
      joined.collect()
      // bucket-to-bucket sort-merge join: only the agg exchanges
      assert(joined.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      assert(shuffles(joined) === 1,
        "bucketed join should leave only the agg exchange:\n" +
          joined.queryExecution.executedPlan)

      // same query unbucketed shuffles both join sides + the agg
      val plain = Q.t(spark, sf, "orders").join(Q.t(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).count()
      plain.collect()
      assert(shuffles(plain) >= 2, plain.queryExecution.executedPlan.toString)
      assert(joined.exceptAll(plain).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
