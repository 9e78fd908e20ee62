package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. One JVM-wide session (getOrCreate)
  * across suites keeps `sbt test` fast.
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  def quiet(): Unit = spark.sparkContext.setLogLevel("WARN")

  /** All messages down an exception's cause chain — Spark wraps domain
    * errors (SparkException → ExecutionException → the real one), so
    * asserting on a single getMessage is flaky across layers.
    */
  def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  /** A sibling session on the SAME SparkContext, built with
    * GraftExtensions (the shared base session predates them) — the
    * CALL-surface suites' session. Default/active session pointers
    * are saved and restored so other suites are untouched.
    */
  def extensionsSession(appName: String): SparkSession = {
    spark.sparkContext // force base session/context creation first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      SparkSession.builder()
        .master("local[8]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
