package graft

import graft.lake.ManifestTable
import graft.streaming.{GraftTableSource, GraftTableSourceProvider}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path => JPath, Paths}
import java.nio.file.attribute.FileTime
import scala.jdk.CollectionConverters._

/** In-commit timestamps (round-18 item 1): the commit wall-clock is
  * stamped INSIDE each manifest/delta file's `#ict` header, so
  * `TIMESTAMP AS OF`, CDF timestamp anchors and `history()` survive a
  * table-directory copy/rsync/migration that perturbs file mtimes —
  * the failure mode of the old mtime-derived commit time. Legacy logs
  * without the header keep the mtime fallback.
  */
class IctSpec extends SparkTestBase {
  quiet()
  import spark.implicits._

  private def scratch(name: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_test_$name"
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  /** Copy `src` to `dst` recursively, then push EVERY file's mtime a
    * day into the future — the migration that breaks mtime-based
    * commit times.
    */
  private def copyWithPerturbedMtimes(src: String, dst: String): Unit = {
    val s = Paths.get(src); val d = Paths.get(dst)
    Files.walk(s).iterator().asScala.foreach { p =>
      val t = d.resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t): Unit
      else Files.copy(p, t): Unit
    }
    val future = FileTime.fromMillis(System.currentTimeMillis() + 86400000L)
    Files.walk(d).iterator().asScala.foreach { p =>
      Files.setLastModifiedTime(p, future): Unit
    }
  }

  private def threeCommits(root: String): (ManifestTable, Seq[Long]) = {
    val mt = new ManifestTable(spark, root)
    val base = (1 to 40).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    mt.write(base, "overwrite") // v0
    mt.write((41 to 60).map(i => (i.toLong, s"r$i")).toDF("k", "v"),
      "append") // v1
    mt.write((61 to 70).map(i => (i.toLong, s"r$i")).toDF("k", "v"),
      "append") // v2
    (mt, (0 to 2).map(mt.commitTimeOf))
  }

  test("ICT: stamps are strictly monotonic and survive a copy with " +
    "perturbed mtimes") {
    val root = scratch("ict_src")
    val (mt, times) = threeCommits(root)
    assert(times(0) < times(1) && times(1) < times(2),
      s"stamps must be strictly monotonic: $times")
    // the header is really in the files (not mtime-derived)
    val dst = scratch("ict_copy")
    copyWithPerturbedMtimes(root, dst)
    val copy = new ManifestTable(spark, dst)
    assert((0 to 2).map(copy.commitTimeOf) === times,
      "commit times must survive the copy byte-for-byte")
    // TIMESTAMP AS OF resolves identically on the copy
    assert(copy.versionAtOrBefore(times(1)) === Some(1))
    assert(copy.versionAtOrBefore(times(1) - 1) === mt
      .versionAtOrBefore(times(1) - 1))
    assert(copy.readAsOf(times(1)).count() === 60)
    assert(copy.readAsOf(times(0)).count() === 40)
    // history() reports the stamped times
    val hist = copy.history().select("version", "commit_ts")
      .as[(Int, java.sql.Timestamp)].collect().toMap
    assert((0 to 2).forall(v => hist(v).getTime === times(v)))
  }

  test("ICT: CDF timestamp anchors resolve identically on the copy") {
    val root = scratch("ict_cdf_src")
    val (_, times) = threeCommits(root)
    val dst = scratch("ict_cdf_copy")
    copyWithPerturbedMtimes(root, dst)
    def batch(opts: (String, String)*): DataFrame = {
      val r = spark.read
        .format(classOf[GraftTableSourceProvider].getName)
        .option("root", dst)
        .option("readChangeFeed", "true")
        .option("keys", "k")
      opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
    }
    // startingTimestamp at v2's stamp: only v2 flows
    val from2 = batch("startingTimestamp" -> times(2).toString)
    assert(from2.filter(col("_commit_version") < 2L).count() === 0)
    assert(from2.filter(col("_commit_version") === 2L).count() === 10)
    // endingTimestamp at v1's stamp bounds the range below v2
    val upTo1 = batch("startingVersion" -> "1",
      "endingTimestamp" -> times(1).toString)
    assert(upTo1.filter(col("_commit_version") === 2L).count() === 0)
    assert(upTo1.filter(col("_commit_version") === 1L).count() === 20)
  }

  test("ICT: CDF _commit_timestamp column equals history() commit_ts " +
    "per version, on all batch surfaces") {
    val root = scratch("ict_ts_col")
    val (mt, times) = threeCommits(root)
    val feed = GraftTableSource.batchChanges(spark, root,
      Seq("k"), 0, 2)
    val perVersion = feed.groupBy("_commit_version")
      .agg(countDistinct("_commit_timestamp").as("n"),
        max("_commit_timestamp").as("ts"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    (0 to 2).foreach { v =>
      assert(perVersion(v.toLong)._1 === 1L, s"one stamp per version v$v")
      assert(perVersion(v.toLong)._2.getTime === times(v),
        s"v$v stamp must equal commitTimeOf")
    }
    // the TVF carries it too
    val s2 = extensionsSession("graft-ict-tvf")
    val viaTvf = s2.sql(
      s"SELECT _commit_version, _commit_timestamp FROM " +
        s"graft_table_changes('$root', 1, 2, 'k')")
      .distinct().as[(Long, java.sql.Timestamp)].collect().toMap
    assert(viaTvf(1L).getTime === times(1))
    assert(viaTvf(2L).getTime === times(2))
    // and the stream surface
    val out = scratch("ict_stream_out"); val ckpt = scratch("ict_stream_ck")
    spark.readStream
      .format(classOf[GraftTableSourceProvider].getName)
      .option("root", root)
      .option("readChangeFeed", "true")
      .option("keys", "k")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = spark.read.parquet(out)
      .select("_commit_version", "_commit_timestamp").distinct()
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(streamed.size === 3)
    (0 to 2).foreach(v => assert(streamed(v.toLong).getTime === times(v)))
    assert(mt.latestVersion === Some(2))
  }

  test("ICT: legacy logs without the header fall back to mtime and " +
    "still read") {
    val root = scratch("ict_legacy_src")
    val (mt, _) = threeCommits(root)
    val rows = mt.read().count()
    val dst = scratch("ict_legacy")
    copyWithPerturbedMtimes(root, dst)
    // strip the #ict header from every log file — a pre-ICT table
    val logDir = Paths.get(dst, "_graft_log")
    Files.list(logDir).iterator().asScala.foreach { p: JPath =>
      val n = p.getFileName.toString
      if (n.endsWith(".manifest") || n.endsWith(".delta")) {
        val lines = Files.readAllLines(p).asScala
          .filterNot(_.startsWith("#ict"))
        Files.write(p, lines.asJava): Unit
        // the out-of-band rewrite invalidates Hadoop's .crc sidecar
        Files.deleteIfExists(p.getParent.resolve(s".$n.crc")): Unit
        Files.setLastModifiedTime(p, FileTime.fromMillis(
          System.currentTimeMillis() + 86400000L)): Unit
      }
    }
    val legacy = new ManifestTable(spark, dst)
    assert(legacy.read().count() === rows, "entries must parse unchanged")
    // mtime fallback: times exist (the perturbed future mtimes) and
    // versionAtOrBefore still finds the latest under a late-enough pin
    val t2 = legacy.commitTimeOf(2)
    assert(t2 > System.currentTimeMillis(), "fallback IS the file mtime")
    assert(legacy.versionAtOrBefore(t2 + 1000).nonEmpty)
  }

  test("ICT: vacuum-materialized checkpoint preserves the original " +
    "commit time") {
    val root = scratch("ict_vac")
    val mt = new ManifestTable(spark, root)
    mt.write((1 to 20).map(i => (i.toLong, s"r$i")).toDF("k", "v"),
      "overwrite") // v0
    (1 to 4).foreach { i =>
      mt.write(Seq((100L + i, s"x$i")).toDF("k", "v"), "append")
    }
    val before = (0 to 4).map(mt.commitTimeOf)
    Thread.sleep(5) // vacuum runs later than the commits it preserves
    mt.vacuum(retain = 2, minAgeMs = 0)
    // v3 (the oldest kept) had delta-only form with v2 dropped — a
    // checkpoint was materialized beside its delta; its stamp must be
    // the ORIGINAL commit time, not the vacuum's
    assert(mt.commitTimeOf(3) === before(3))
    assert(mt.commitTimeOf(4) === before(4))
    assert(mt.read(Some(3)).count() === 23)
  }
}
