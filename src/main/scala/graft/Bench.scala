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

    // median-of-3 per query: a single sample at this SF is dominated by
    // fixed overhead and machine-contention noise (round-1 recorded two
    // set-op outliers 10× their clean-run time); the median of three
    // back-to-back runs is stable round-over-round
    def run(name: String): Double = {
      val samples = Seq.fill(3)(runOnce(name))
      if (samples.exists(_ < 0)) -1.0 else samples.sorted.apply(1)
    }

    // warm-up: JVM/codegen/first-scan costs land here, not in a
    // measured query
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
