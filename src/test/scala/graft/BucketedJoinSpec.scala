package graft

import graft.lake.ManifestTable
import org.apache.spark.sql.functions._

/** Storage-partitioned joins (L22b): two tables bucketed `bucket(n,k)`
  * joined on k through readBucketed must plan WITHOUT an Exchange on
  * either side, and the result must equal the plain-read join.
  */
class BucketedJoinSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def scratch(tag: String) =
    s"${sys.props("java.io.tmpdir")}/graft_bjoin_${tag}_${System.nanoTime()}"

  private def mkTable(tag: String, n: Int, df: org.apache.spark.sql.DataFrame,
      key: String): ManifestTable = {
    val mt = new ManifestTable(spark, scratch(tag),
      partitionSpec = Seq(s"bucket($n,$key)"))
    mt.write(df, "overwrite")
    mt
  }

  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-bucketed join has no exchange and matches the plain join") {
    val orders = (1L to 500L).map(k => (k, s"o$k", (k % 7).toDouble))
      .toDF("order_id", "tag", "amt")
    val items = (1L to 1500L).map(i => (i % 600 + 1, i, (i % 5).toDouble))
      .toDF("order_id", "item_id", "qty")
    val a = mkTable("orders", 8, orders, "order_id")
    val b = mkTable("items", 8, items, "order_id")

    // fixture tables are tiny enough to broadcast (which would also be
    // exchange-free for the BIG side but planted a BroadcastExchange);
    // disable broadcast so the test proves the merge-join path
    val joined = noBroadcast {
      val j = a.readBucketed("order_id")
        .join(b.readBucketed("order_id"), Seq("order_id"))
      j.collect() // finalize AQE
      j
    }
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed join should not shuffle either side:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("Join"), p)

    val want = a.read().join(b.read(), Seq("order_id"))
    assert(joined.exceptAll(want).isEmpty && want.exceptAll(joined).isEmpty)
  }

  test("bucketed aggregation on the bucket key also skips the exchange") {
    val orders = (1L to 300L).map(k => (k % 40, k, k.toDouble))
      .toDF("k", "id", "v")
    val mt = mkTable("agg", 6, orders, "k")
    val agg = mt.readBucketed("k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"agg on the bucket key should reuse the layout:\n$p")
    val want = mt.read().groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    assert(agg.exceptAll(want).isEmpty && want.exceptAll(agg).isEmpty)
  }

  test("mismatched bucket counts still join correctly (with a shuffle)") {
    val l = (1L to 100L).map(k => (k, k * 2)).toDF("k", "a")
    val r = (1L to 100L).map(k => (k, k * 3)).toDF("k", "b")
    val a = mkTable("m8", 8, l, "k")
    val b = mkTable("m4", 4, r, "k")
    val joined = a.readBucketed("k").join(b.readBucketed("k"), Seq("k"))
    assert(joined.count() === 100)
  }

  test("readBucketed row set is identical to read() incl. empty buckets") {
    // 3 distinct keys into 16 buckets: most buckets empty
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (1L, "d")).toDF("k", "v")
    val mt = mkTable("sparse", 16, df, "k")
    val got = mt.readBucketed("k")
    assert(got.exceptAll(mt.read()).isEmpty &&
      mt.read().exceptAll(got).isEmpty)
    assert(got.rdd.getNumPartitions === 16)
  }

  test("self-join of one readBucketed frame analyzes and is correct") {
    // DeduplicateRelations needs the scan leaf to be a
    // MultiInstanceRelation to re-instance one branch's attribute ids;
    // without it this exact query throws a conflicting-references
    // AnalysisException while the same query through read() works
    val df = Seq((1L, "a"), (2L, "b"), (2L, "c"), (3L, "d")).toDF("k", "v")
    val mt = mkTable("selfjoin", 4, df, "k")
    val d = mt.readBucketed("k")
    val pairs = d.as("a").join(d.as("b"), col("a.k") === col("b.k"))
      .select(col("a.v").as("va"), col("b.v").as("vb"))
    // 2 singleton keys contribute 1 pair each; key 2 contributes 4
    assert(pairs.count() === 6)
    val union = d.unionByName(d)
    assert(union.count() === df.count() * 2)
  }

  test("refuses without a bucket transform and with deletion vectors") {
    val mt = new ManifestTable(spark, scratch("plain"))
    mt.write(Seq((1L, "x")).toDF("k", "v"), "overwrite")
    intercept[IllegalArgumentException] { mt.readBucketed("k") }

    val dv = mkTable("dv", 4, (1L to 50L).map(k => (k, s"v$k")).toDF("k", "v"),
      "k")
    dv.delete(col("k") === 7L)
    intercept[IllegalArgumentException] { dv.readBucketed("k") }
  }

  test("bucket-key type drift across appends fails loudly, never silently") {
    // v0 buckets by hash of k: INT, the append by hash of k: LONG —
    // the same value can land in different buckets, so a reported
    // HashPartitioning would be a lie. The schema-inference pass
    // refuses the int/long mix before the per-row guard is even
    // reached — either way the failure is loud, never missing rows
    val mt = new ManifestTable(spark, scratch("drift"),
      partitionSpec = Seq("bucket(4,k)"))
    mt.write((1 to 50).map(k => (k, k)).toDF("k", "x"), "overwrite")
    mt.write((51L to 80L).map(k => (k, k)).toDF("k", "x"), "append")
    val e = intercept[Exception] { mt.readBucketed("k").collect() }
    val chain = messageChain(e)
    assert(chain.contains("MERGE") || chain.contains("convert") ||
      chain.contains("hashes outside bucket"), chain)
  }

  test("placement guard catches same-type corruption inside a bucket") {
    // overwrite one bucket file IN PLACE with rows whose keys hash to
    // other buckets (schema unchanged, manifest unchanged) — only the
    // per-row placement check can see this, and a silent miss would
    // surface as dropped join rows under the reported partitioning
    val root = scratch("corrupt")
    val mt = new ManifestTable(spark, root, partitionSpec = Seq("bucket(4,k)"))
    mt.write((1L to 40L).map(k => (k, k)).toDF("k", "x"), "overwrite")

    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val target = Files.walk(Paths.get(root)).iterator().asScala
      .find(p => p.toString.contains("_graft_p_bucket4_k=") &&
        p.toString.endsWith(".parquet"))
      .getOrElse(fail("no bucket data file found"))
    val dirBucket = target.getParent.getFileName.toString
      .split('=').last.toInt
    val wrong = spark.range(100, 160)
      .select(col("id").as("k"), col("id").as("x"))
      .withColumn("b", pmod(hash(col("k")), lit(4)))
      .filter(col("b") =!= lit(dirBucket)).drop("b").limit(5)
    val tmp = scratch("corrupt_tmp")
    wrong.coalesce(1).write.parquet(tmp)
    val part = Files.walk(Paths.get(tmp)).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    Files.copy(part, target, StandardCopyOption.REPLACE_EXISTING)
    // drop the local-FS checksum sidecar so the tamper is invisible to
    // everything except the placement guard
    Files.deleteIfExists(
      target.getParent.resolve(s".${target.getFileName}.crc"))

    val e = intercept[Exception] { mt.readBucketed("k").collect() }
    assert(messageChain(e).contains("hashes outside bucket"), messageChain(e))
  }

  test("appends land in the same buckets; join stays exchange-free") {
    val a = mkTable("app", 4, (1L to 60L).map(k => (k, k)).toDF("k", "x"), "k")
    a.write((61L to 90L).map(k => (k, k)).toDF("k", "x"), "append")
    val b = mkTable("app2", 4, (1L to 90L).map(k => (k, -k)).toDF("k", "y"),
      "k")
    val j = noBroadcast {
      val d = a.readBucketed("k").join(b.readBucketed("k"), Seq("k"))
      d.collect()
      d
    }
    assert(!j.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(j.count() === 90)
  }
}
