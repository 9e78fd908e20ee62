package graft

import org.apache.spark.sql.functions._

/** Every declared query executes at sf0.001 and returns a sane result.
  * (Value-level correctness is enforced end-to-end by the DuckDB oracle
  * gate — tools/check_oracle.py; these specs guard executability and
  * per-operator invariants that the oracle can't see.)
  */
class QueriesSpec extends SparkTestBase {
  quiet()

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf)
      // count() after materialization; queries that can legitimately be
      // empty at tiny SF still must execute.
      assert(df.count() >= 0)
    }
  }

  test("entry smoke: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }

  test("j7 as-of join: every purchase row appears exactly once (left join)") {
    val purchases = Q.t(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val res = SparkEntry.queries("j7_asof_join")(spark, sf)
    assert(res.count() === purchases)
    // matched click must never be after the purchase
    val bad = res.filter(col("last_click_ts") > col("ts")).count()
    assert(bad === 0)
  }

  test("j6b bucketed range join ≡ plain range join") {
    // same band semantics through the (user, hour-bucket) equi-key —
    // the bucketing is a superset pre-filter, the residual is exact
    val plain = SparkEntry.queries("j6_range_join")(spark, sf)
    val bucketed = SparkEntry.queries("j6b_bucketed_range")(spark, sf)
    assert(bucketed.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(bucketed).count() === 0)
  }

  test("w4 ntile: quartiles are balanced within 1") {
    val res = SparkEntry.queries("w4_ntile")(spark, sf)
      .groupBy("value_quartile").count().collect()
    val sizes = res.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
  }

  test("l6 first-per-key keeps NULLS FIRST parity with its oracle") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a NULL doc_id must WIN its group (the oracle's ROW_NUMBER orders
    // doc_id ASC NULLS FIRST; a bare min_by would skip the null key) —
    // stage a mini documents table and run the real query
    val dir = s"${sys.props("java.io.tmpdir")}/graft_l6_nulls_${System.nanoTime()}"
    Seq((Option(7L), "en", "web", 10L), (None: Option[Long], "en", "web", 20L),
      (Option(3L), "de", "web", 30L))
      .toDF("doc_id", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.Lakehouse.l6ExactDedup(spark, dir)
      .orderBy(col("lang"))
      .collect().map(r => (r.isNullAt(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq === Seq((false, "de", 30L), (true, "en", 20L)),
      s"null doc_id must win the en group: ${got.mkString(", ")}")
  }
}
