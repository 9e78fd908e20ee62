package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round instrumentation (guide §1): run named queries
  * under a SparkListener that attributes wall time to individual jobs
  * and stages, so a slow query can be blamed on a concrete operator
  * (which shuffle, which scan, how many tasks) instead of guessed at.
  *
  *   SPARK_GRAFT_PROFILE_ONLY=a13_quantile_exact,sub5_recursive \
  *     sbt "runMain graft.tools.ProfileQuery"
  *
  * Prints, per query: total seconds per run, then each job's duration,
  * stage count, task count, shuffle read/write bytes and description.
  * Optionally dumps .explain("formatted") of the query's final frame
  * to $SPARK_GRAFT_PLAN_DIR/<name>.txt.
  */
object ProfileQuery {

  private case class StageAgg(var tasks: Int = 0, var shufRead: Long = 0,
    var shufWrite: Long = 0, var input: Long = 0, var ms: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B experiment hook: SPARK_GRAFT_CONF="k=v;k=v" applied up front
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })

    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long, String, Int)]
    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    val jobStages = mutable.Map.empty[Int, Seq[Int]]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))
            .orElse(Option(p.getProperty("spark.job.callSite.short"))))
          .getOrElse {
            val det = e.stageInfos.lastOption.map(_.details).getOrElse("")
            det.linesIterator.find(_.contains("graft."))
              .orElse(det.linesIterator.take(1).toSeq.headOption)
              .getOrElse("").trim
          }
        jobs.synchronized {
          jobs(e.jobId) = (e.time, -1L, desc, e.stageIds.size)
          jobStages(e.jobId) = e.stageIds.map(_.toInt)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach { case (t0, _, d, n) =>
            jobs(e.jobId) = (t0, e.time, d, n)
          }
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          val a = stages.getOrElseUpdate(e.stageId, StageAgg())
          a.tasks += 1
          val m = e.taskMetrics
          if (m != null) {
            a.shufRead += m.shuffleReadMetrics.totalBytesRead
            a.shufWrite += m.shuffleWriteMetrics.bytesWritten
            a.input += m.inputMetrics.bytesRead
            a.ms += m.executorRunTime
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // poor-man's driver profiler: sample the main thread every 5 ms,
    // bucket by the TOPMOST graft frame (else the topmost spark/hadoop
    // frame) — attributes the driver-side gaps between jobs
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val frame = st.find(f => f.getClassName.startsWith("graft."))
            .map(f => s"${f.getClassName.split('$').head}.${f.getMethodName}:${f.getLineNumber}")
            .orElse(st.headOption.map(f =>
              s"${f.getClassName}.${f.getMethodName}"))
            .getOrElse("?")
          samples.merge(frame, 1, (a, b) => a + b)
        }
        Thread.sleep(5)
      }
    }, "graft-profiler")
    sampler.setDaemon(true)
    sampler.start()

    // warm-up: JVM/codegen/first-scan, as Bench does
    try graft.SparkEntry.entry(spark)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val only = sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    val runs = sys.env.get("SPARK_GRAFT_PROFILE_RUNS")
      .flatMap(_.toIntOption).getOrElse(2)

    names.foreach { n =>
      (1 to runs).foreach { r =>
        jobs.synchronized { jobs.clear(); stages.clear(); jobStages.clear() }
        samples.clear()
        sampling = true
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        df.write.format("noop").mode("overwrite").save()
        val tTot = (System.nanoTime() - t0) / 1e9
        sampling = false
        println(f"== $n run$r: total=$tTot%.2fs build=$tBuild%.2fs " +
          f"jobs=${jobs.size}")
        if (r == runs) jobs.synchronized {
          jobs.foreach { case (id, (s, e, d, _)) =>
            val dur = if (e < 0) -1.0 else (e - s) / 1000.0
            val st = jobStages.getOrElse(id, Nil).flatMap(stages.get)
            val tasks = st.map(_.tasks).sum
            val sr = st.map(_.shufRead).sum / 1e6
            val sw = st.map(_.shufWrite).sum / 1e6
            val in = st.map(_.input).sum / 1e6
            val run = st.map(_.ms).sum / 1000.0
            println(f"  job$id%-4d $dur%6.2fs tasks=$tasks%-5d " +
              f"exec=$run%6.2fs in=$in%8.1fMB sr=$sr%7.1fMB sw=$sw%7.1fMB  $d")
          }
        }
        if (r == runs) {
          import scala.jdk.CollectionConverters._
          val top = samples.asScala.toSeq.sortBy(-_._2).take(14)
          top.foreach { case (f, c) =>
            println(f"  drv ${c * 0.005}%6.2fs  $f")
          }
        }
        if (r == runs) planDir.foreach { pd =>
          val p = java.nio.file.Paths.get(pd)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.write(p.resolve(s"$n.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .getBytes("UTF-8"))
        }
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
