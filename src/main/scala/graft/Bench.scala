package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query on SPARK_GRAFT_SF_DIR,
  * one JSON line out. Each query is fully materialized through a
  * noop-format write (count() would let Catalyst prune the
  * projections being measured); a warm-up pass absorbs JVM/codegen
  * startup so per-query numbers reflect steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // min-of-3 per query: the work is fixed, so the fastest sample is
    // the one least polluted by co-tenant contention and GC (timeit
    // semantics). Median still recorded a 10–40× outlier whenever
    // contention spanned a query's whole 3-sample window (r1: set ops;
    // r2: j1/p3); min is stable round-over-round on a shared box
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def run(name: String): Double = {
      // adaptive: 3 samples, then up to 2 more until the two BEST
      // agree within 10% — min-of-n is only a stable estimator when
      // at least two samples escaped co-tenant contention, and the
      // extra draws go exactly to the queries where jitter hit
      // (back-to-back full-suite runs showed sub-3s queries off by
      // up to 1.35× with a fixed 3)
      val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
      def draw(): Unit = {
        val g0 = gcMillis
        val t = runOnce(name)
        if (debug) System.err.println(
          f"[bench] $name sample=$t%.2fs gc=${(gcMillis - g0) / 1000.0}%.2fs " +
            f"heapMB=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / (1 << 20)}")
        samples += t
      }
      def settled: Boolean = {
        val s = samples.sorted
        s(1) <= s(0) * 1.10
      }
      (1 to 3).foreach(_ => draw())
      while (samples.forall(_ >= 0) && !settled && samples.size < 5) draw()
      if (samples.exists(_ < 0)) -1.0 else samples.min
    }

    // warm-up: JVM/codegen/first-scan costs land here, not in a
    // measured query
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // Per-query lines stream out as each query completes, so the full
    // suite stays machine-readable even if the tail of the capture is
    // truncated; the one-line summary (the driver contract) still goes
    // last, and a complete copy lands in bench_results.json.
    // local-iteration hook: SPARK_GRAFT_BENCH_ONLY=q1,q2 benches a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { n =>
      val g0 = gcMillis
      val v = run(n)
      val gq = (gcMillis - g0) / 1000.0
      println(f"""{"query":"$n","sec":$v,"gcsec":$gq%.2f}""")
      Console.out.flush()
      // suite hygiene: a query's cached/broadcast leftovers must not
      // tax its successors — round-8 saw 2-3x drift on the queries
      // that happened to run late in the alphabet, with no code change
      spark.catalog.clearCache()
      System.gc()
      n -> v
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","n_queries":${results.size}}"""
    try {
      val out = java.nio.file.Paths.get("bench_results.json")
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // file copy is best-effort
    println(line)
    spark.stop()
  }
}
