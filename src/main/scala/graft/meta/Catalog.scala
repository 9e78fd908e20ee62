package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Zone layout + catalog registration (S6, SURVEY.md §2.1) — the
  * Spark-native stand-in for the reference's S3 buckets + Glue
  * database (`/root/reference/s3_bucket.py:8-13`,
  * `glue_infra.py:71-79,146-153`): zones are directories under a
  * lakehouse root, tables register in `spark.catalog` under a
  * database, names follow the crawler prefix rule.
  */
class Catalog(spark: SparkSession, lakeRoot: String, db: String = "retail_lakehouse_db") {

  val zones: Map[String, String] =
    Seq("raw", "bronze", "silver", "gold").map(z => z -> s"$lakeRoot/$z-zone").toMap

  def ensureDatabase(): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  /** Crawler-style table name: `<first path segment>_<table dir>`
    * (mirrors the reference's TablePrefix rule,
    * `/root/reference/glue_infra.py:105`).
    */
  def tableName(tablePath: String): String = {
    val segs = tablePath.split("/").filter(_.nonEmpty)
    s"${segs.head.split("_").head}_${segs.last}"
  }

  /** Register a zone table into the session catalog (external parquet
    * location — the catalog stores metadata only, like Glue).
    */
  def register(zone: String, tablePath: String, df: DataFrame): String = {
    ensureDatabase()
    val location = s"${zones(zone)}/$tablePath"
    df.write.mode("overwrite").parquet(location)
    val name = s"$db.${tableName(tablePath)}"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.catalog.createTable(name, location)
    name
  }

  def listTables(): Seq[String] = {
    ensureDatabase()
    spark.catalog.listTables(db).collect().map(_.name).toSeq.sorted
  }
}
