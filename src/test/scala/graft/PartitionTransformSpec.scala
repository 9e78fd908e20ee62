package graft

import graft.lake.{ManifestTable, PartitionTransform}
import org.apache.spark.sql.functions._

/** Hidden partitioning (Iceberg-style partition transforms): derived
  * hive layout, scans without hidden columns, transform-aware point
  * and range pruning, merge scoping on derived tuples, and config
  * round-trip through forRoot.
  */
class PartitionTransformSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_ptrans_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private def eventsDf = (0 until 300).map { i =>
    (i.toLong, (i % 24).toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${i % 3 + 1}%02d ${i % 24}%02d:15:00"),
      s"v$i")
  }.toDF("event_id", "user_id", "ts", "payload")

  test("days+bucket layout: derived dirs on disk, hidden in scans, exact reads") {
    val root = scratch("daysbucket")
    val t = new ManifestTable(spark, root,
      partitionSpec = Seq("days(ts)", "bucket(8,user_id)"))
    t.write(eventsDf, "overwrite")

    // dirs: hidden hive columns with derived values
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dayDirs = fs.listStatus(new org.apache.hadoop.fs.Path(root, "data"))
      .map(_.getPath.getName).filter(_.startsWith("_graft_p_days_ts=")).sorted
    assert(dayDirs.toSeq === Seq(
      "_graft_p_days_ts=2024-01-01",
      "_graft_p_days_ts=2024-01-02",
      "_graft_p_days_ts=2024-01-03"))

    // scans never surface hidden columns; row set is exact
    val out = t.read()
    assert(out.columns.sorted.toSeq === Seq("event_id", "payload", "ts", "user_id"))
    assert(out.count() === 300)
    assert(out.exceptAll(eventsDf).count() === 0)

    // point lookup through the bucket transform: exact + actually pruned
    val want = eventsDf.filter(col("user_id") === 7L)
    val got = t.readPartitionEq("user_id", "7")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    val all = t.filesDf().count()
    val pruned = t.prunedFilesPartitionEq("user_id", "7").size
    assert(pruned < all, s"expected pruning: $pruned vs $all files")

    // range through the days transform: exact incl. boundaries
    val wantR = eventsDf.filter(
      col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp")
        && col("ts") <= lit("2024-01-03 23:59:59").cast("timestamp"))
    val gotR = t.readPartitionRange("ts", "2024-01-02 00:00:00", "2024-01-03 23:59:59")
    assert(gotR.exceptAll(wantR).count() === 0)
    assert(wantR.exceptAll(gotR).count() === 0)

    // bucket range refuses (hashing destroys ordering)
    intercept[IllegalArgumentException] {
      t.readPartitionRange("user_id", "1", "5")
    }
    // no transform on payload
    intercept[IllegalArgumentException] { t.readPartitionEq("payload", "x") }
  }

  test("merge on a days-partitioned table rewrites only the touched day") {
    val root = scratch("merge")
    val t = new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
    t.write(eventsDf, "overwrite")
    val before = t.filesDf().collect().map(_.getString(0)).toSet

    // update one event on day 2 only
    val upd = eventsDf.filter(col("event_id") === 100L)
      .withColumn("payload", lit("UPDATED"))
    t.merge(upd, Seq("event_id"))

    val after = t.filesDf().collect().map(_.getString(0)).toSet
    val day2 = "_graft_p_days_ts=2024-01-02"
    // every file outside day 2 carried forward by reference
    assert(before.filterNot(_.contains(day2)).subsetOf(after))
    // day 2 was rewritten (old day-2 files gone)
    assert(before.filter(_.contains(day2)).intersect(after).isEmpty)
    // content correct
    val want = eventsDf.withColumn("payload",
      when(col("event_id") === 100L, "UPDATED").otherwise(col("payload")))
    assert(t.read().exceptAll(want).count() === 0)
    assert(want.exceptAll(t.read()).count() === 0)
  }

  test("forRoot round-trips the partition spec; appends land derived dirs") {
    val root = scratch("roundtrip")
    new ManifestTable(spark, root, partitionSpec = Seq("days(ts)", "bucket(8,user_id)"))
      .write(eventsDf.filter(col("event_id") < 100L), "overwrite")
    val again = ManifestTable.forRoot(spark, root)
    again.write(eventsDf.filter(col("event_id") >= 100L), "append")
    assert(again.read().count() === 300)
    assert(again.read().exceptAll(eventsDf).count() === 0)
    // pruning still works through the reloaded instance
    val got = again.readPartitionEq("user_id", "3")
    val want = eventsDf.filter(col("user_id") === 3L)
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("truncate transform: int bins and string prefixes, range-prunable") {
    val root = scratch("trunc")
    val t = new ManifestTable(spark, root, partitionSpec = Seq("truncate(100,event_id)"))
    val df = (0 until 500).map(i => (i.toLong, s"r$i")).toDF("event_id", "x")
    t.write(df, "overwrite")
    val want = df.filter(col("event_id").between(150L, 260L))
    val got = t.readPartitionRange("event_id", "150", "260")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    // pruned: bins 0 and 300/400 skipped → fewer files than total
    assert(t.prunedFilesPartitionEq("event_id", "42").size < t.filesDf().count())

    val root2 = scratch("truncs")
    val t2 = new ManifestTable(spark, root2, partitionSpec = Seq("truncate(2,code)"))
    val df2 = Seq("aa1", "aa2", "ab1", "ba9", "bb0").zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("id", "code")
    t2.write(df2, "overwrite")
    val gotS = t2.readPartitionEq("code", "ab1")
    assert(gotS.collect().map(_.getString(1)).toSeq === Seq("ab1"))
    val gotR = t2.readPartitionRange("code", "aa0", "ab9")
    assert(gotR.collect().map(_.getString(1)).sorted.toSeq === Seq("aa1", "aa2", "ab1"))
  }

  test("evolvePartitionSpec migrates the layout in one commit; history keeps the old one") {
    val root = scratch("evolve")
    val t0 = new ManifestTable(spark, root) // unpartitioned
    t0.write(eventsDf, "overwrite")
    val v0 = t0.latestVersion.get

    val t1 = t0.evolvePartitionSpec(Nil, Seq("days(ts)"))
    // data identical, layout migrated
    assert(t1.read().count() === 300)
    assert(t1.read().exceptAll(eventsDf).count() === 0)
    assert(t1.filesDf().collect().map(_.getString(0))
      .forall(_.contains("_graft_p_days_ts=")), "all files under the new layout")
    // transform pruning works through the evolved instance
    val want = eventsDf.filter(
      col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp")
        && col("ts") <= lit("2024-01-02 23:59:59").cast("timestamp"))
    val got = t1.readPartitionRange("ts", "2024-01-02 00:00:00", "2024-01-02 23:59:59")
    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // time travel to the pre-evolution version still serves the old files
    assert(t1.read(Some(v0)).count() === 300)
    // forRoot picks up the evolved spec (appends land derived dirs)
    val t2 = ManifestTable.forRoot(spark, root)
    t2.write(eventsDf.withColumn("event_id", col("event_id") + 1000L), "append")
    assert(t2.read().count() === 600)

    // second evolution: add a bucket level
    val t3 = t2.evolvePartitionSpec(Nil, Seq("days(ts)", "bucket(4,user_id)"))
    assert(t3.readPartitionEq("user_id", "7").count() ===
      t3.read().filter(col("user_id") === 7L).count())

    // refusals: unknown column, renamed column
    intercept[IllegalArgumentException] {
      t3.evolvePartitionSpec(Seq("nope"))
    }
    t3.renameColumn("payload", "body")
    intercept[IllegalArgumentException] {
      ManifestTable.forRoot(spark, root).evolvePartitionSpec(Seq("body"))
    }
  }

  test("time travel across a transform CHANGE keeps old hidden columns hidden") {
    val root = scratch("evolvehist")
    val t0 = new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
    t0.write(eventsDf, "overwrite")
    val v0 = t0.latestVersion.get
    // change the transform SET (days -> months): pre-evolution files
    // still carry _graft_p_days_ts in their hive paths; a time-travel
    // read must hide it exactly like the current layout's column
    val t1 = t0.evolvePartitionSpec(Nil, Seq("months(ts)"))
    val hist = t1.read(Some(v0))
    assert(!hist.columns.exists(_.startsWith(PartitionTransform.Prefix)),
      s"old hidden layout column leaked: ${hist.columns.mkString(", ")}")
    assert(hist.count() === 300)
    assert(!t1.read().columns.exists(_.startsWith(PartitionTransform.Prefix)))
  }

  test("transform parsing round-trips; malformed specs refuse") {
    val specs = Seq("days(ts)", "months(ts)", "hours(ts)",
      "bucket(16,id)", "truncate(4,name)")
    specs.foreach(s => assert(PartitionTransform.parse(s).spec === s))
    intercept[IllegalArgumentException] { PartitionTransform.parse("zap(ts)") }
    intercept[IllegalArgumentException] { PartitionTransform.parse("ts") }
    intercept[IllegalArgumentException] { PartitionTransform.parse("bucket(0,x)") }
  }
}
