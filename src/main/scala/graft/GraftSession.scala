package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing session ergonomics: register the lakehouse star as
  * temp views so the full Spark SQL dialect works directly —
  * `spark.sql("SELECT ... FROM lineitem JOIN orders ...")`. (The
  * engine deliberately has no SQL parser of its own, SURVEY.md §7
  * non-goals: Spark SQL *is* the parser.)
  */
object GraftSession {

  val starTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table of a scale dir as a temp view. */
  def registerStar(spark: SparkSession, dir: String): Unit =
    starTables.foreach { t =>
      Q.t(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Convenience: register + run one SQL string. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    registerStar(spark, dir)
    spark.sql(query)
  }
}
