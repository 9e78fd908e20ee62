package graft.tools

import graft.lake.ManifestTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot scale evidence for COVERAGE.md — not part of the query
  * surface. Two measurements the round-15 verdict asked to record:
  *
  *  1. VACUUM over a 50k-file data tree (the distributed listing /
  *     anti-join / delete path): a driver-recursive walk at this count
  *     is already seconds of serialized listStatus; the Spark-job form
  *     must stay flat as the tree grows.
  *  2. CDC replay cost ∝ CHANGED ROWS, not changed files: a 10-row
  *     update against a 2M-row table must replay from its write-time
  *     sidecar in sidecar-read time, vs the keyed per-commit diff that
  *     re-reads and shuffles the commit's touched files.
  *
  * Run: `sbt "runMain graft.tools.ScaleChecks"` — prints one JSON line.
  */
object ScaleChecks {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeMs[A](f: => A): (A, Long) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1000000L)
    }

    // ---- 1. 50k-file vacuum ----
    val vroot = s"${sys.props("java.io.tmpdir")}/graft_scale_vacuum"
    val vpath = new org.apache.hadoop.fs.Path(vroot)
    val fs = vpath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(vpath, true)
    val mt = new ManifestTable(spark, vroot)
    mt.write(spark.range(1000).toDF("id"), "overwrite") // v0: the live files
    // 50k stray data files across 100 subdirs — the shape a heavily
    // churned partitioned table leaves for vacuum (content is
    // irrelevant: vacuum lists, anti-joins and deletes by path)
    val strayDirs = 100
    val strayPerDir = 500
    for (d <- 0 until strayDirs) {
      val dir = java.nio.file.Paths.get(s"$vroot/data/part=$d")
      java.nio.file.Files.createDirectories(dir)
      for (f <- 0 until strayPerDir)
        java.nio.file.Files.createFile(dir.resolve(f"stray_$f%05d.parquet"))
    }
    val (dry, dryMs) = timeMs(mt.vacuum(retain = 1, dryRun = true, minAgeMs = 0))
    val (real, realMs) = timeMs(mt.vacuum(retain = 1, minAgeMs = 0))
    require(dry.size == strayDirs * strayPerDir,
      s"dry run found ${dry.size} of ${strayDirs * strayPerDir} strays")
    require(real.count(_.endsWith(".parquet")) == strayDirs * strayPerDir,
      s"vacuum deleted ${real.size}")
    require(mt.read().count() == 1000, "live rows survived")
    fs.delete(vpath, true)

    // ---- 2. CDC replay ∝ changed rows ----
    val croot = s"${sys.props("java.io.tmpdir")}/graft_scale_cdc"
    val cpath = new org.apache.hadoop.fs.Path(croot)
    fs.delete(cpath, true)
    val big = new ManifestTable(spark, croot)
    big.write(spark.range(2000000L)
      .select(col("id"), (col("id") % 997).as("k"),
        concat(lit("v"), col("id")).as("payload")), "overwrite")
    big.enableCdc()
    big.updateWhere(col("id") % 200000L === 0L,
      Map("payload" -> concat(col("payload"), lit("!")))) // 10 rows
    val v = big.latestVersion.get
    val (sidecarRows, sidecarMs) = timeMs(big.changesAt(v, None).count())
    val (diffRows, diffMs) = timeMs(
      big.changesBetween(v - 1, v, Seq("id")).count())
    require(sidecarRows == 20, s"sidecar rows $sidecarRows")
    require(diffRows == 20, s"diff rows $diffRows")
    fs.delete(cpath, true)

    println(
      s"""{"vacuum_files":${strayDirs * strayPerDir},"vacuum_dry_ms":$dryMs,""" +
        s""""vacuum_delete_ms":$realMs,"cdc_table_rows":2000000,""" +
        s""""cdc_changed_rows":10,"cdc_sidecar_ms":$sidecarMs,""" +
        s""""cdc_keyed_diff_ms":$diffMs}""")
    spark.stop()
  }
}
