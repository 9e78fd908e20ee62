package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Raw-zone CSV ingestion (S1–S3, SURVEY.md §2.1), Spark-native
  * equivalent of the reference's upload router + Glue crawlers
  * (`/root/reference/s3_bucket.py:39-70`, `glue_infra.py:85-120`).
  *
  * - S1: header CSV read with schema inference, empty string = NULL.
  * - S2: malformed-header repair — the reference's products.csv header
  *   declares 4 names but rows carry 5 fields
  *   (`/root/reference/datasets/products.csv:1-2`); a name-based read
  *   silently shifts every column. Detection is rule-driven (header
  *   vs data-row field count), repair is positional (explicit schema,
  *   header line skipped).
  * - S3: filename routing + date-partition derivation by regex
  *   (`/root/reference/s3_bucket.py:50-64`), then partitioned bronze
  *   write — at scale the bronze table is partition-pruned by day.
  */
object RawIngest {

  val DateRe = "(\\d{4}-\\d{2}-\\d{2})"

  /** S3 routing rule: filename prefix → zone-relative table path
    * (mirrors the reference's upload router, incl. the misc catch-all).
    */
  def route(filename: String): String =
    if (filename.startsWith("orders")) "transactional/orders"
    else if (filename.startsWith("order_items")) "transactional/order_items"
    else if (filename.startsWith("products")) "product"
    else "misc"

  /** S1: inferred read. nullValue="" surfaces the reference's empty
    * numeric cells (order_items.days_since_prior_order) as NULLs.
    */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", true)
      .option("inferSchema", true)
      .option("nullValue", "")
      .csv(path)

  /** Field counts of the first (header) and second (data) physical
    * lines. Naive comma split is correct for the reference fixtures
    * (no quoted fields); quoted-CSV detection would swap in a real
    * CSV tokenizer here.
    */
  def headerFieldCounts(spark: SparkSession, path: String): (Int, Int) = {
    val p = new Path(path)
    val fs: FileSystem = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try {
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      val header = if (lines.hasNext) lines.next() else ""
      val data = if (lines.hasNext) lines.next() else ""
      (header.split(",", -1).length, data.split(",", -1).length)
    } finally in.close()
  }

  /** S2: read with repair when the header is inconsistent with the
    * data rows. `positional` is the trusted schema applied by position
    * (header line skipped); consistent files fall back to S1 inference.
    * Returns (df, repaired?).
    */
  def readCsvRepaired(spark: SparkSession, path: String,
      positional: StructType): (DataFrame, Boolean) = {
    val (h, d) = headerFieldCounts(spark, path)
    if (h != d) {
      require(positional.length == d,
        s"positional schema has ${positional.length} fields, data rows have $d")
      val df = spark.read
        .option("header", true) // skip the lying header line
        .option("nullValue", "")
        .schema(positional)
        .csv(path)
      (df, true)
    } else (readCsvInferred(spark, path), false)
  }

  /** S1/S2 quarantine path: PERMISSIVE read against a trusted schema;
    * rows that fail to parse land whole in `_corrupt_record` and are
    * split out. Returns (good rows, quarantined raw lines). The
    * quarantine side keeps only the raw line — at scale it's a tiny
    * side output written beside the bronze table for replay.
    */
  def readCsvWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", org.apache.spark.sql.types.StringType))
    val df = spark.read
      .option("header", true)
      .option("nullValue", "")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
      .cache() // one pass computes both splits
    val good = df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, quarantined)
  }

  /** S3: derive the partition date from the source filename (regex per
    * the reference router) and stamp lineage columns.
    */
  def withFilenamePartition(df: DataFrame): DataFrame =
    df
      .withColumn("_src_file", input_file_name())
      .withColumn("date", to_date(regexp_extract(col("_src_file"), DateRe, 1)))

  /** Raw → bronze: read a whole raw table directory of daily CSVs,
    * derive partitions, write partitioned parquet. Dynamic partition
    * overwrite keeps re-ingestion of one day from clobbering others.
    */
  def ingestToBronze(spark: SparkSession, rawGlob: String,
      bronzeDir: String): DataFrame = {
    val df = withFilenamePartition(readCsvInferred(spark, rawGlob))
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date")
      .parquet(bronzeDir)
    spark.read.parquet(bronzeDir)
  }
}
