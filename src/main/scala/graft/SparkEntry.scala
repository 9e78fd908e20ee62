package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 registers here via its QueryModule:
  * a named DataFrame query plus (where SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  /** All query modules. Order is irrelevant (names must be unique). */
  private val modules: Seq[QueryModule] = Seq(
    Flagship,
    Analytics,
    Ingest,
    Projections,
    Joins,
    Aggregates,
    Windows,
    SortSetOps,
    Functions,
    Lakehouse,
    StreamingQueries,
    TextAnalysis,
    DataMix,
    Dedup,
    Similarity,
    MultimodalQueries,
    Reshape,
    Subqueries,
    TimeSeries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    require(all.size == all.map(_._1).distinct.size, "duplicate query names")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = modules.flatMap(_.oracles).toMap
}
