package graft

import graft.operators.Salting
import graft.streaming.Stateful
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scale utilities: salted joins/aggregations equal their plain
  * counterparts; stateful streaming accumulates across micro-batches.
  */
class ScaleOpsSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val li = Q.t(spark, sf, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    val part = Q.t(spark, sf, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
    val salted = Salting.saltedJoin(li, part, Seq("l_partkey"), factor = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("hot-key-split join ≡ plain join; hot leg broadcasts, cold leg shuffles") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    val helper = new AdaptiveSparkPlanHelper {}
    // skewed large side: key 1 dominates; small side: one row per key
    val large = ((1 to 5000).map(_ => (1L, "hot")) ++
      (1 to 500).map(i => ((i % 50 + 2).toLong, s"cold$i")))
      .toDF("k", "payload")
    val small = (1L to 60L).map(i => (i, s"dim$i")).toDF("k", "label")
    val plain = large.join(small, Seq("k"))
    val split = Salting.hotKeySplitJoin(large, small, Seq("k"),
      hotThreshold = 1000L, maxHotKeys = 4)
    assert(split.count() === plain.count())
    assert(split.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(split).count() === 0)

    // plan: with autoBroadcast off, the hot leg STILL broadcasts (our
    // explicit hint) while the cold leg stays a shuffle join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val q = Salting.hotKeySplitJoin(large, small, Seq("k"),
        hotThreshold = 1000L, maxHotKeys = 4)
      q.count()
      val plan = q.queryExecution.executedPlan
      val bhj = helper.collectWithSubqueries(plan) {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      val smj = helper.collectWithSubqueries(plan) {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
        case s: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => s
      }
      assert(bhj.nonEmpty, s"hot leg must broadcast:\n$plan")
      assert(smj.nonEmpty, s"cold leg must shuffle-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    // no hot keys → degenerates to exactly the plain join
    val nohot = Salting.hotKeySplitJoin(large, small, Seq("k"),
      hotThreshold = 100000L)
    assert(nohot.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(nohot).count() === 0)
  }

  test("salt spreads FULLY-IDENTICAL duplicate rows (worst-case hot key)") {
    // all rows identical in every column: a content-only hash would
    // put them all in one salt bucket and the straggler would remain
    val dup = spark.range(8000).select(lit(1L).as("k"), lit("x").as("v"))
    val spread = Salting.saltLarge(dup, 8)
      .groupBy(Salting.SaltCol).count().collect()
    assert(spread.length === 8, s"expected 8 salt buckets, got ${spread.length}")
    val counts = spread.map(_.getLong(1))
    assert(counts.max < 3 * counts.min,
      s"identical rows did not spread evenly: ${counts.toSeq}")
  }

  test("salt spreads a hot key across partitions") {
    // all rows share ONE key — worst-case skew
    val hot = Q.t(spark, sf, "lineitem").withColumn("k", lit(1))
    val salted = Salting.saltLarge(hot, 8)
    val spread = salted.groupBy(Salting.SaltCol).count().collect()
    assert(spread.length === 8)
    val counts = spread.map(_.getLong(1))
    assert(counts.max < counts.sum / 2, "salt failed to spread the hot key")
  }

  test("skew-safe two-phase count equals plain count") {
    val li = Q.t(spark, sf, "lineitem")
    val plain = li.groupBy("l_returnflag").count()
      .withColumnRenamed("count", "n")
    val safe = Salting.skewSafeCount(li, Seq("l_returnflag"), 8)
    assert(safe.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(safe).count() === 0)
  }

  test("capBaskets bounds a synthetic mega-basket's pair count; default is identity") {
    import graft.queries.Analytics
    // one 5,000-item mega-basket among normal baskets — the skew bomb
    // that would emit C(5000,2) ≈ 12.5M pairs from ONE join key
    val mega = spark.range(5000).select(lit(999999L).as("k"), col("id").as("item"))
    val normal = spark.range(300)
      .select((col("id") % 100).as("k"), col("id").as("item"))
    val items = mega.unionByName(normal)
    val capped = Analytics.capBaskets(items, "k", "item", 50)
    val sizes = capped.groupBy("k").count().collect().map(_.getLong(1))
    assert(sizes.max <= 50, "no basket may exceed the cap")
    assert(capped.filter(col("k") === 999999L).count() === 50)
    assert(capped.filter(col("k") =!= 999999L).count() === 300,
      "small baskets pass through whole")
    // capped self-join pair count is bounded by orders·C(cap,2), not data
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.k") === col("b.k") && col("a.item") < col("b.item")).count()
    assert(pairs <= 101 * 50 * 49 / 2)
    assert(pairs < 5000L * 4999 / 2, "mega-basket quadratic blowup not capped")
    // deterministic: same hash ranking both runs
    val again = Analytics.capBaskets(items, "k", "item", 50)
    assert(capped.exceptAll(again).count() === 0)
    // Int.MaxValue is the identity — the exact/oracle path is untouched
    assert(Analytics.capBaskets(items, "k", "item", Int.MaxValue)
      .exceptAll(items).count() === 0)
    // and the oracled query itself is unchanged at the default
    val q = Analytics.fn3CoPurchase(spark, sf)
    val qDefault = Analytics.fn3CoPurchase(spark, sf, Int.MaxValue)
    assert(q.exceptAll(qDefault).count() === 0)
  }

  test("O3: sortWithinPartitions orders rows inside each partition without a shuffle") {
    val o = Q.t(spark, sf, "orders").repartition(4, col("o_custkey"))
      .sortWithinPartitions(col("o_orderdate"), col("o_orderkey"))
    // no extra exchange beyond the repartition
    val exchanges = o.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange"))
    assert(exchanges === 1)
    // every partition is internally ordered
    import org.apache.spark.sql.Row
    val ok = o.select("o_orderdate", "o_orderkey").rdd
      .mapPartitions { it =>
        val rows = it.toSeq.map { case Row(d: java.time.LocalDateTime, k: Long) => (d, k) }
        Iterator.single(rows == rows.sortBy(r => (r._1.toString, r._2)))
      }.collect()
    assert(ok.forall(identity))
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // Spark's InjectRuntimeFilter builds a bloom filter from the
    // selective (creation) side and pushes a might_contain probe into
    // the large side's scan — the shuffle-join analogue of broadcast
    // pruning, and at 100 TB the difference between shuffling the
    // whole fact table and shuffling the ~matching slice. Default
    // thresholds target real clusters (10 GB application side), so the
    // spec pins them down to fixture scale; the assertion is that the
    // engine's plan actually carries the filter.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = Q.t(spark, sf, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_orderkey") < 100)
      val l = Q.t(spark, sf, "lineitem")
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        "no runtime bloom filter injected:\n" + opt)
      // and the filtered plan still returns exactly the right rows
      val expected = Q.t(spark, sf, "lineitem").as("l")
        .join(Q.t(spark, sf, "orders")
          .filter(col("o_orderstatus") === "F" && col("o_orderkey") < 100).as("o"),
          col("l.l_orderkey") === col("o.o_orderkey")).count()
      assert(j.agg(sum(col("n"))).first().getLong(0) === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("stateful dedup: TTL evicts state, key re-emits after eviction") {
    import java.sql.Timestamp
    val dir = s"${sys.props("java.io.tmpdir")}/graft_ttl_dedup"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    new java.io.File(dir).mkdirs()

    def ts(m: String) = Timestamp.valueOf(s"2024-06-06 $m:00")
    import spark.implicits._
    // b1: key A + in-batch duplicate → one emit; TTL clock starts 10:00
    // b2: key B at 12:00 → watermark advances to ~11:59 (1 min delay)
    // b3: key C → batch with no A data: A times out (10:30 < wm), evicted
    // b4: A reappears at 12:30 → state is gone → re-emits
    Seq(Stateful.Keyed("A", ts("10:00"), 1.0),
        Stateful.Keyed("A", ts("10:01"), 2.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b1.parquet")
    Seq(Stateful.Keyed("B", ts("12:00"), 3.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b2.parquet")
    Seq(Stateful.Keyed("C", ts("12:01"), 4.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b3.parquet")
    Seq(Stateful.Keyed("A", ts("12:30"), 5.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b4.parquet")

    val stream = spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Stateful.Keyed]].schema)
      .option("recursiveFileLookup", true)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[Stateful.Keyed]
    val q = Stateful.dedupFirstSeenTtl(spark, stream,
        watermarkDelay = "1 minute", ttlMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("ttl_dedup")
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("ttl_dedup").as[Stateful.Keyed].collect()
      .map(k => (k.key, k.ts.toString, k.value)).toSet
    assert(got === Set(
      ("A", "2024-06-06 10:00:00.0", 1.0), // first seen, dup suppressed
      ("B", "2024-06-06 12:00:00.0", 3.0),
      ("C", "2024-06-06 12:01:00.0", 4.0),
      ("A", "2024-06-06 12:30:00.0", 5.0))) // re-emitted post-eviction
  }

  test("stateful dedup: late re-arrival in the timeout batch starts a new epoch") {
    import java.sql.Timestamp
    val dir = s"${sys.props("java.io.tmpdir")}/graft_ttl_dedup2"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    new java.io.File(dir).mkdirs()
    def ts(m: String) = Timestamp.valueOf(s"2024-06-06 $m:00")
    import spark.implicits._
    // b1: A at 10:00 (TTL until 10:30)
    // b2: B at 13:00 → watermark jumps to 12:59, far past A's TTL
    // b3: A again at 13:05 — A's state is logically expired but its
    //     timeout callback hasn't fired (data arrives in the same batch
    //     that would fire it); must re-emit, not crash on re-arming the
    //     timeout below the watermark
    Seq(Stateful.Keyed("A", ts("10:00"), 1.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b1.parquet")
    Seq(Stateful.Keyed("B", ts("13:00"), 2.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b2.parquet")
    Seq(Stateful.Keyed("A", ts("13:05"), 3.0)).toDS()
      .coalesce(1).write.parquet(s"$dir/b3.parquet")

    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Stateful.Keyed]].schema)
      .option("recursiveFileLookup", true)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[Stateful.Keyed]
    val q = Stateful.dedupFirstSeenTtl(spark, stream,
        watermarkDelay = "1 minute", ttlMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("ttl_dedup2")
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("ttl_dedup2").as[Stateful.Keyed].collect()
      .map(k => (k.key, k.value)).toSet
    assert(got === Set(("A", 1.0), ("B", 2.0), ("A", 3.0)))
  }

  test("flatMapGroupsWithState accumulates user profiles across batches") {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_stateful"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    new java.io.File(dir).mkdirs()

    val ev = Q.t(spark, sf, "events")
      .select(col("user_id"), col("event_type"), col("value"))
    ev.filter(col("user_id") < 8).write.parquet(s"$dir/b1.parquet")
    ev.filter(col("user_id") >= 8).write.parquet(s"$dir/b2.parquet")

    val stream = spark.readStream.schema(ev.schema)
      .option("recursiveFileLookup", true)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
      .as[Stateful.Event]
    val q = Stateful.userProfiles(spark, stream)
      .writeStream.format("memory").queryName("profiles")
      .outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    // latest state per user equals the batch aggregation
    val latest = spark.table("profiles")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_purchases").as("n_purchases"))
    val expected = ev.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
    assert(latest.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(latest).count() === 0)
  }
}
