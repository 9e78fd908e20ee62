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

  test("setPartitionSpec: lazy daily→hourly — old and new files each prune by their OWN spec") {
    val root = scratch("lazyevolve")
    val old = eventsDf.filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
    val fresh = eventsDf.filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
    val t0 = new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
    t0.write(old, "overwrite")
    val filesBefore = t0.filesDf().collect().map(_.getString(0)).toSet

    // config-only: zero data movement, no new version
    val t1 = t0.setPartitionSpec(Nil, Seq("hours(ts)"))
    assert(t1.latestVersion === t0.latestVersion)
    assert(t1.filesDf().collect().map(_.getString(0)).toSet === filesBefore)

    // new commits land the NEW layout; old files keep the old one
    t1.write(fresh, "append")
    val files = t1.filesDf().collect().map(_.getString(0))
    assert(files.exists(_.contains("_graft_p_days_ts=")), "old layout kept")
    assert(files.exists(_.contains("_graft_p_hours_ts=")), "new layout used")

    // mixed-layout scan: exact, hidden columns stay hidden
    val out = t1.read()
    assert(!out.columns.exists(_.startsWith(PartitionTransform.Prefix)))
    assert(out.count() === 300)
    assert(out.exceptAll(eventsDf).count() === 0)
    assert(eventsDf.exceptAll(out).count() === 0)

    // a day-1 lookup prunes NEW hourly files entirely (their hour can't
    // match) and old daily files down to day 1
    val day1 = t1.prunedFilesPartitionEq("ts", "2024-01-01 06:15:00")
    assert(day1.nonEmpty &&
      day1.forall(_.contains("_graft_p_days_ts=2024-01-01")),
      s"day-1 lookup scanned: ${day1.mkString(", ")}")
    // a day-3 lookup prunes old daily files entirely (days 1-2 only)
    // and hourly files down to the ONE matching hour
    val hour = t1.prunedFilesPartitionEq("ts", "2024-01-03 08:15:00")
    assert(hour.nonEmpty &&
      hour.forall(_.contains("_graft_p_hours_ts=2024-01-03-08")),
      s"day-3 lookup scanned: ${hour.mkString(", ")}")

    // point + range reads stay exact across the spec boundary
    val gotEq = t1.readPartitionEq("ts", "2024-01-03 08:15:00")
    val wantEq = eventsDf.filter(col("ts") === lit("2024-01-03 08:15:00").cast("timestamp"))
    assert(gotEq.exceptAll(wantEq).count() === 0 && wantEq.exceptAll(gotEq).count() === 0)
    val wantR = eventsDf.filter(
      col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp")
        && col("ts") <= lit("2024-01-03 05:59:59").cast("timestamp"))
    val gotR = t1.readPartitionRange("ts", "2024-01-02 00:00:00", "2024-01-03 05:59:59")
    assert(gotR.exceptAll(wantR).count() === 0 && wantR.exceptAll(gotR).count() === 0)

    // forRoot round-trips the lazy spec
    val (idc, specs) = ManifestTable.forRoot(spark, root).declaredPartitioning
    assert(idc.isEmpty && specs === Seq("hours(ts)"))
  }

  test("merge on a mixed-layout table scopes each file by its own spec and migrates rewrites") {
    val root = scratch("lazymerge")
    val old = eventsDf.filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
    val fresh = eventsDf.filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
    val t0 = new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
    t0.write(old, "overwrite")
    val t1 = t0.setPartitionSpec(Nil, Seq("hours(ts)"))
    t1.write(fresh, "append")
    val before = t1.filesDf().collect().map(_.getString(0)).toSet

    // event 0 lives on day 1 (old daily file); event 2 on day 3 hour 2
    // (new hourly file) — the merge must rewrite exactly the day-1
    // daily file and the hour-2 hourly file
    val upd = eventsDf.filter(col("event_id").isin(0L, 2L))
      .withColumn("payload", lit("UPDATED"))
    t1.merge(upd, Seq("event_id"))
    val after = t1.filesDf().collect().map(_.getString(0)).toSet

    val day1Seg = "_graft_p_days_ts=2024-01-01"
    val hourSeg = "_graft_p_hours_ts=2024-01-03-02"
    assert(before.filter(_.contains(day1Seg)).intersect(after).isEmpty,
      "touched old-spec day partition rewritten")
    assert(before.filter(_.contains(hourSeg)).intersect(after).isEmpty,
      "touched new-spec hour partition rewritten")
    assert(before.filterNot(f => f.contains(day1Seg) || f.contains(hourSeg))
      .subsetOf(after), "every other file carried by reference")
    // rewrites land under the CURRENT spec — progressive migration
    assert(after.diff(before).nonEmpty &&
      after.diff(before).forall(_.contains("_graft_p_hours_ts=")),
      s"rewrites not migrated: ${after.diff(before).mkString(", ")}")

    val want = eventsDf.withColumn("payload",
      when(col("event_id").isin(0L, 2L), "UPDATED").otherwise(col("payload")))
    assert(t1.read().exceptAll(want).count() === 0)
    assert(want.exceptAll(t1.read()).count() === 0)
  }

  test("compaction migrates a mixed-layout table to the current spec; path-exact ops refuse until then") {
    val root = scratch("lazycompact")
    val old = eventsDf.filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp"))
    val fresh = eventsDf.filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
    val t0 = new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
    t0.write(old, "overwrite")
    val t1 = t0.setPartitionSpec(Nil, Seq("hours(ts)"))
    t1.write(fresh, "append")

    // path-exact partition overwrite refuses the mixed state loudly
    val err = intercept[IllegalArgumentException] {
      t1.overwritePartitionValues(fresh, Seq("2024-01-03-02"))
    }
    assert(err.getMessage.contains("predate the current partition spec"))

    // compact() rewrites everything under the current spec
    t1.compact(targetFiles = 4)
    val files = t1.filesDf().collect().map(_.getString(0))
    assert(files.forall(_.contains("_graft_p_hours_ts=")),
      s"unmigrated files: ${files.filterNot(_.contains("_graft_p_hours_ts=")).mkString(", ")}")
    assert(t1.read().count() === 300)
    assert(t1.read().exceptAll(eventsDf).count() === 0)
    // homogeneous again: hourly pruning applies to every file
    val hour = t1.prunedFilesPartitionEq("ts", "2024-01-01 06:15:00")
    assert(hour.nonEmpty &&
      hour.forall(_.contains("_graft_p_hours_ts=2024-01-01-06")))
    // and the path-exact overwrite works again
    t1.overwritePartitionValues(
      eventsDf.filter(col("ts") === lit("2024-01-03 02:15:00").cast("timestamp"))
        .withColumn("payload", lit("REPLACED")),
      Seq("2024-01-03-02"))
    assert(t1.read().filter(col("payload") === "REPLACED").count() ===
      eventsDf.filter(col("ts") === lit("2024-01-03 02:15:00").cast("timestamp")).count())
  }

  test("insert-only merge into a fresh partition removes nothing and keeps the schema") {
    val root = scratch("insertonly")
    val t = new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
    t.write(eventsDf.filter(col("ts") < lit("2024-01-03 00:00:00").cast("timestamp")),
      "overwrite")
    val before = t.filesDf().collect().map(_.getString(0)).toSet
    // feed = ONLY new keys, all landing on a day with no existing files:
    // the merge's removed set is empty, and the rewrite frame must keep
    // the table schema (a bare empty readEntries would lose it)
    val fresh = eventsDf.filter(col("ts") >= lit("2024-01-03 00:00:00").cast("timestamp"))
      .withColumn("event_id", col("event_id") + 5000L)
    t.merge(fresh, Seq("event_id"))
    val after = t.filesDf().collect().map(_.getString(0)).toSet
    assert(before.subsetOf(after), "no existing file rewritten")
    assert(t.read().count() === 300)
    assert(t.read().filter(col("event_id") >= 5000L).count() === fresh.count())
  }

  test("SQL surface: CALL graft.set_partition_spec is config-only; refusals mirror the API") {
    val root = scratch("lazysql")
    new ManifestTable(spark, root, partitionSpec = Seq("days(ts)"))
      .write(eventsDf, "overwrite")
    val sqlSpark: org.apache.spark.sql.SparkSession =
      extensionsSession("graft-lazy-spec-sql")
    val v = sqlSpark.sql(s"CALL graft.set_partition_spec('$root', '', 'months(ts)')")
      .first().getInt(0)
    assert(v === ManifestTable.forRoot(spark, root).latestVersion.get,
      "lazy spec change commits no new version")
    val (_, specs) = ManifestTable.forRoot(spark, root).declaredPartitioning
    assert(specs === Seq("months(ts)"))
    // unknown column refuses
    val err = intercept[Exception] {
      sqlSpark.sql(s"CALL graft.set_partition_spec('$root', '', 'days(nope)')").collect()
    }
    assert(messageChain(err).contains("not in table"))
  }

  test("transform name round-trips through fromName (the per-file spec identity)") {
    val specs = Seq("days(ts)", "months(event_ts)", "years(ts)", "hours(ts)",
      "bucket(16,user_id)", "truncate(4,name)")
    specs.foreach { s =>
      val t = PartitionTransform.parse(s)
      assert(PartitionTransform.fromName(t.name) === Some(t), s"round-trip of $s")
    }
    assert(PartitionTransform.fromName("region") === None)
    assert(PartitionTransform.fromName("_graft_p_zap_x") === None)
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
