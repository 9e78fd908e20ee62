package graft.tools

import graft.lake.ManifestTable
import org.apache.spark.sql.SparkSession

/** Driver-heap evidence for the de-drivered VACUUM (round-16 verdict
  * item 1): a vacuum over ≥500k unreferenced files whose PATHS alone
  * would previously have lived on the driver twice — once in the
  * referenced `Set`, once in the collected candidate array — must now
  * complete with FLAT driver heap, because the referenced set, the
  * anti-join and the delete all stay distributed Datasets and only a
  * count crosses the driver ([[ManifestTable.vacuumCount]]).
  *
  * The stray files are given ~1.3 KB paths (five nested 240-char
  * directory levels) so the old collected form would be ≥1.3 GB of
  * UTF-16 path strings — guaranteed to breach a 2 GiB heap — while
  * the new form's peak is whatever Spark itself needs. Run with an
  * explicit small heap to make the claim falsifiable:
  *
  *   java -Xmx2g -cp target/scala-2.13/classes:/opt/spark/jars/\*
  *        graft.tools.VacuumScale
  *
  * Prints one JSON line: file count, vacuum wall-time, sampled peak
  * used heap (MB) during the vacuum, and heap before/after.
  */
object VacuumScale {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val strayFiles = sys.env.getOrElse("GRAFT_VACUUM_FILES", "500000").toInt
    val root = s"${sys.props("java.io.tmpdir")}/graft_vacuum_scale"
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(rootPath, true)

    val mt = new ManifestTable(spark, root)
    mt.write(spark.range(1000).toDF("id"), "overwrite") // v0: live files

    // strays: 1000 leaf dirs × (strayFiles/1000) files, five 240-char
    // nested levels so each path is ~1.3 KB — created as a Spark job
    // (500k serialized driver creates would take minutes)
    val perDir = strayFiles / 1000
    val seg = "x" * 240
    val t0 = System.nanoTime()
    spark.sparkContext.parallelize(0 until 1000, cpus * 4).foreach { d =>
      val dir = java.nio.file.Paths.get(
        s"$root/data/p0=$seg/p1=$seg/p2=$seg/p3=$seg/d=$d")
      java.nio.file.Files.createDirectories(dir)
      for (f <- 0 until perDir)
        java.nio.file.Files.createFile(dir.resolve(f"stray_$f%05d.parquet")): Unit
    }
    val setupSec = (System.nanoTime() - t0) / 1e9

    val rt = Runtime.getRuntime
    def usedMb(): Long = {
      System.gc()
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }
    val before = usedMb()
    // background peak sampler — catches the high-water mark INSIDE the
    // vacuum, which a before/after pair would miss
    @volatile var peak = 0L
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        val u = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
        if (u > peak) peak = u
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val v0 = System.nanoTime()
    val deleted = mt.vacuumCount(retain = 1, minAgeMs = 0)
    val vacSec = (System.nanoTime() - v0) / 1e9
    stop = true
    sampler.join()
    val after = usedMb()

    require(deleted >= strayFiles,
      s"vacuumCount deleted $deleted, expected >= $strayFiles strays")
    require(mt.read().count() == 1000, "live rows survived")
    val pathBytesIfCollected = 2L * 1300 * strayFiles / (1024 * 1024)
    println(s"""{"check":"vacuum_scale","files":$strayFiles,""" +
      s""""deleted":$deleted,"setup_sec":${f"$setupSec%.1f"},""" +
      s""""vacuum_sec":${f"$vacSec%.1f"},"heap_before_mb":$before,""" +
      s""""heap_peak_mb":$peak,"heap_after_mb":$after,""" +
      s""""max_heap_mb":${rt.maxMemory() / (1024 * 1024)},""" +
      s""""legacy_collect_lower_bound_mb":$pathBytesIfCollected}""")
    fs.delete(rootPath, true)
    spark.stop()
  }
}
