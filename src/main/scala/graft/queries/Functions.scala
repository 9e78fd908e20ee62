package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families F1–F7 (SURVEY.md §2.8). All built-in
  * `functions._` — fully codegen'd, no UDFs.
  *
  * Determinism notes: math stays on exact paths (abs/floor/ceil on
  * 2-decimal money, sqrt is IEEE-exact, x*x instead of pow); date
  * functions operate on day-granularity timestamps; hash functions
  * (md5/sha2) are bit-exact hex in both engines.
  */
object Functions extends QueryModule {

  /** F1: string functions over customer names. */
  def f1String(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "customer")
      .select(
        col("c_custkey"),
        lower(col("c_name")).as("name_lower"),
        upper(col("c_mktsegment")).as("seg_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        lpad(col("c_custkey").cast(StringType), 8, "0").as("key_padded"),
        concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
        split(col("c_name"), "#").getItem(1).as("name_num"),
        trim(lit("  pad  ")).as("trimmed"))
      .orderBy(col("c_custkey").asc)

  val f1Oracle: String =
    """SELECT c_custkey,
      |  lower(c_name) AS name_lower,
      |  upper(c_mktsegment) AS seg_upper,
      |  substring(c_name, 1, 8) AS name_prefix,
      |  CAST(length(c_name) AS INT) AS name_len,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
      |  concat(c_mktsegment, '/', c_name) AS seg_name,
      |  string_split(c_name, '#')[2] AS name_num,
      |  trim('  pad  ') AS trimmed
      |FROM customer
      |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin

  /** F1b: further string functions — initcap/replace/reverse/
    * repeat/position.
    */
  def f1bStringMore(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "part")
      .filter(col("p_partkey") < 100)
      .select(
        col("p_partkey"),
        initcap(col("p_name")).as("name_title"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        reverse(col("p_type")).as("type_rev"),
        repeat(col("p_brand"), 2).as("brand_twice"),
        instr(col("p_name"), "o").as("first_o"))
      .orderBy(col("p_partkey").asc)

  val f1bOracle: String =
    """SELECT p_partkey,
      |  -- initcap semantics: capitalize each space-separated word
      |  array_to_string(list_transform(string_split(p_name, ' '),
      |    w -> upper(w[1:1]) || lower(w[2:])), ' ') AS name_title,
      |  replace(p_name, ' ', '_') AS name_snake,
      |  reverse(p_type) AS type_rev,
      |  repeat(p_brand, 2) AS brand_twice,
      |  CAST(strpos(p_name, 'o') AS INT) AS first_o
      |FROM part
      |WHERE p_partkey < 100
      |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin

  /** F2b: further date functions — trunc/last_day/quarter/dayofweek/
    * months_between on day-grain dates.
    */
  def f2bDateMore(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .filter(col("o_orderkey") < 200)
      .select(
        col("o_orderkey"),
        trunc(col("o_orderdate").cast(DateType), "month").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofweek(col("o_orderdate")).as("dow"),
        months_between(lit("2002-01-01").cast(DateType),
          col("o_orderdate").cast(DateType), roundOff = false).as("months_to_2002"))
      .orderBy(col("o_orderkey").asc)

  val f2bOracle: String =
    """SELECT o_orderkey,
      |  date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(datediff('month', CAST(o_orderdate AS DATE), DATE '2002-01-01')
      |    + (CASE WHEN dayofmonth(o_orderdate) = 1 THEN 0
      |            ELSE (1 - dayofmonth(o_orderdate)) / 31.0 END) AS DOUBLE) AS months_to_2002
      |FROM orders
      |WHERE o_orderkey < 200
      |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin

  /** F2: date/time functions over order dates. */
  def f2DateTime(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .filter(col("o_orderkey") < 200)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType))
          .as("days_to_2002"),
        date_add(col("o_orderdate").cast(DateType), 30).as("due_date"),
        unix_micros(col("o_orderdate").cast(TimestampType)).as("epoch_us"))
      .orderBy(col("o_orderkey").asc)

  val f2Oracle: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
      |  CAST(o_orderdate AS DATE) + 30 AS due_date,
      |  epoch_us(o_orderdate) AS epoch_us
      |FROM orders
      |WHERE o_orderkey < 200
      |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin

  /** F3: math functions on exact-friendly paths. */
  def f3Math(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - lit(5000.0)).as("dist_from_5k"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        round(col("l_discount") * 100.0, 0).as("disc_pct"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)

  val f3Oracle: String =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice - 5000.0) AS dist_from_5k,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  sqrt(l_quantity) AS qty_sqrt,
      |  l_quantity * l_quantity AS qty_sq,
      |  round(l_discount * 100.0, 0) AS disc_pct
      |FROM lineitem
      |WHERE l_orderkey < 200
      |ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST""".stripMargin

  /** F3b: width_bucket histogram — uniform-bucket distribution of order
    * values (the profiling histogram a DQ dashboard draws). DuckDB has
    * no width_bucket, so the oracle uses the defining floor formula;
    * boundary-safe because money values are 0.01-granular and the
    * bucket edges are exact doubles (no value sits within an ulp of an
    * edge). One partial-combined agg on a bounded key.
    */
  def f3bHistogram(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .groupBy(expr("width_bucket(o_totalprice, 0.0, 600000.0, 12)").as("bucket"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("total"))
      .orderBy(col("bucket").asc)

  val f3bOracle: String =
    s"""SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
       |       WHEN o_totalprice >= 600000.0 THEN 13
       |       ELSE floor(o_totalprice / 50000.0) + 1 END AS BIGINT) AS bucket,
       |  COUNT(*) AS n, ${Q.sql.dsum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY 1
       |ORDER BY bucket ASC NULLS FIRST""".stripMargin

  /** F4: conditional functions — CASE buckets, nullif, greatest/least. */
  def f4Conditional(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .withColumn("bucket",
        when(col("o_totalprice") < 50000.0, "low")
          .when(col("o_totalprice") < 200000.0, "mid")
          .otherwise("high"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        Q.dsum(greatest(col("o_totalprice"), lit(10000.0))).as("sum_floored"),
        Q.dsum(least(col("o_totalprice"), lit(300000.0))).as("sum_capped"),
        count(nullif(col("o_orderstatus"), lit("O"))).as("n_not_open"))
      .orderBy(col("bucket").asc)

  val f4Oracle: String =
    s"""SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
       |            WHEN o_totalprice < 200000.0 THEN 'mid'
       |            ELSE 'high' END AS bucket,
       |  COUNT(*) AS n,
       |  ${Q.sql.dsum("greatest(o_totalprice, 10000.0)")} AS sum_floored,
       |  ${Q.sql.dsum("least(o_totalprice, 300000.0)")} AS sum_capped,
       |  COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_open
       |FROM orders
       |GROUP BY 1
       |ORDER BY bucket ASC NULLS FIRST""".stripMargin

  /** F5a: array functions over tokenized documents. Array outputs are
    * serialized via array_join (the driver's pandas comparator cannot
    * hash array cells); slice/array_distinct/sort_array stay under test.
    */
  def f5Array(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .withColumn("tokens", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("tokens")).as("n_tokens"),
        array_contains(col("tokens"), "spark").as("mentions_spark"),
        array_join(slice(col("tokens"), 1, 3), " ").as("first3"),
        array_join(sort_array(array_distinct(col("tokens"))), " ").as("vocab"))
      .orderBy(col("doc_id").asc)

  val f5Oracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
      |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS vocab
      |FROM documents
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  /** F5b: explode / generator — token frequency via explode+groupBy. */
  def f5Explode(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(20)

  val f5ExplodeOracle: String =
    """SELECT token, COUNT(*) AS tf
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |GROUP BY token
      |ORDER BY tf DESC NULLS LAST, token ASC NULLS FIRST
      |LIMIT 20""".stripMargin

  /** F6: JSON functions — extract typed values from event props. */
  def f6Json(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy((col("k") % 10).as("k_mod10"))
      .agg(
        count(lit(1)).as("n"),
        Q.dsum(col("value")).as("value_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("k_mod10").asc)

  val f6Oracle: String =
    s"""SELECT CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS k_mod10,
       |  COUNT(*) AS n,
       |  ${Q.sql.dsum("value")} AS value_sum,
       |  MIN(CAST(json_extract_string(props, '$$.k') AS INT)) AS k_min,
       |  MAX(CAST(json_extract_string(props, '$$.k') AS INT)) AS k_max
       |FROM events
       |GROUP BY 1
       |ORDER BY k_mod10 ASC NULLS FIRST""".stripMargin

  /** F6c: VARIANT semi-structured extraction (Spark 4's open
    * JSON-like type): parse real props JSON AND a synthesized nested
    * document into variants, then typed-path extraction — nested
    * object field, array index, and a missing path that must yield
    * NULL (not fail). The variant encoding stays engine-internal; the
    * EXTRACTED typed values are what cross engines, so the DuckDB
    * oracle reads the same paths with its JSON operators. At scale
    * variant shreds/prunes like a column, where a raw JSON string
    * reparses per access.
    */
  def f6cVariant(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "events")
      .filter(col("event_id") < 500)
      .withColumn("doc", format_string(
        """{"meta":{"type":"%s"},"ids":[%s,%s]}""",
        col("event_type"), col("user_id"), col("event_id")))
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"),
        expr("variant_get(parse_json(doc), '$.meta.type', 'string')").as("etype"),
        expr("variant_get(parse_json(doc), '$.ids[0]', 'long')").as("id0"),
        expr("try_variant_get(parse_json(doc), '$.meta.absent', 'string')").as("missing"))
      .orderBy(col("event_id").asc)

  val f6cOracle: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
      |  json_extract_string(doc, '$.meta.type') AS etype,
      |  CAST(json_extract(doc, '$.ids[0]') AS BIGINT) AS id0,
      |  json_extract_string(doc, '$.meta.absent') AS missing
      |FROM (
      |  SELECT event_id, props,
      |    '{"meta":{"type":"' || event_type || '"},"ids":[' || user_id ||
      |      ',' || event_id || ']}' AS doc
      |  FROM events WHERE event_id < 500)
      |ORDER BY event_id ASC NULLS FIRST""".stripMargin

  /** F2c: calendar gap filling — a dense (priority × day) grid over a
    * fixed window, zero-filled where no orders exist. `sequence` +
    * `explode` generates the calendar; the left join pulls actuals.
    * The dashboard-feeding shape: time series must not skip days.
    */
  def f2cGapFill(spark: SparkSession, dir: String): DataFrame = {
    val days = spark.range(1)
      .select(explode(expr(
        "sequence(DATE'1995-03-01', DATE'1995-03-30', interval 1 day)")).as("day"))
    val prios = Q.t(spark, dir, "orders")
      .select(col("o_orderpriority")).distinct()
    val actual = Q.t(spark, dir, "orders")
      .withColumn("day", to_date(col("o_orderdate")))
      .filter(col("day").between("1995-03-01", "1995-03-30"))
      .groupBy(col("o_orderpriority"), col("day"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("total"))
    days.crossJoin(prios)
      .join(actual, Seq("o_orderpriority", "day"), "left")
      .select(col("o_orderpriority"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total"), lit(0.0)).as("total"))
      .orderBy(col("o_orderpriority").asc, col("day").asc)
  }

  val f2cOracle: String =
    s"""WITH days AS (
       |  SELECT CAST(unnest(generate_series(DATE '1995-03-01',
       |    DATE '1995-03-30', INTERVAL 1 DAY)) AS DATE) AS day),
       |prios AS (SELECT DISTINCT o_orderpriority FROM orders),
       |actual AS (
       |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
       |    COUNT(*) AS n, ${Q.sql.dsum("o_totalprice")} AS total
       |  FROM orders
       |  WHERE CAST(o_orderdate AS DATE)
       |    BETWEEN DATE '1995-03-01' AND DATE '1995-03-30'
       |  GROUP BY 1, 2)
       |SELECT p.o_orderpriority, d.day,
       |  COALESCE(a.n, 0) AS n, COALESCE(a.total, 0.0) AS total
       |FROM days d CROSS JOIN prios p
       |LEFT JOIN actual a ON a.o_orderpriority = p.o_orderpriority
       |  AND a.day = d.day
       |ORDER BY p.o_orderpriority ASC NULLS FIRST, d.day ASC NULLS FIRST""".stripMargin

  /** F6b: map functions — build, merge, introspect, and transform a
    * MAP<STRING,STRING> assembled from event columns. The oracle
    * recomputes each scalar from the raw columns (first-principles
    * check of the map semantics; DuckDB's MAP surface differs).
    */
  def f6bMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val m = map_concat(
      map_from_arrays(
        array(lit("type"), lit("k")),
        array(col("event_type"), get_json_object(col("props"), "$.k"))),
      map(lit("src"), lit("evt")))
    Q.t(spark, dir, "events")
      .filter(col("event_id") < 50)
      .select(
        col("event_id"),
        size(m).as("n_keys"),
        array_join(sort_array(map_keys(m)), ",").as("keys"),
        element_at(m, "k").cast(IntegerType).as("k_val"),
        element_at(transform_values(m, (_, v) => upper(v)), "type").as("type_upper"),
        size(map_filter(m, (_, v) => v.rlike("^[0-9]+$"))).as("numeric_vals"))
      .orderBy(col("event_id").asc)
  }

  val f6bOracle: String =
    """SELECT event_id,
      |  CAST(3 AS INT) AS n_keys,
      |  'k,src,type' AS keys,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
      |  upper(event_type) AS type_upper,
      |  CAST(CASE WHEN regexp_matches(json_extract_string(props, '$.k'), '^[0-9]+$') THEN 1 ELSE 0 END
      |     + CASE WHEN regexp_matches(event_type, '^[0-9]+$') THEN 1 ELSE 0 END
      |     + 0 AS INT) AS numeric_vals
      |FROM events
      |WHERE event_id < 50
      |ORDER BY event_id ASC NULLS FIRST""".stripMargin
  def f7Hash(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(
        col("doc_id"),
        md5(col("text").cast(BinaryType)).as("text_md5"),
        sha2(col("text").cast(BinaryType), 256).as("text_sha256"))
      .orderBy(col("doc_id").asc)

  val f7Oracle: String =
    """SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
      |FROM documents
      |WHERE doc_id < 50
      |ORDER BY doc_id ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f1_string_funcs" -> f1String,
    "f1b_string_more" -> f1bStringMore,
    "f2_datetime_funcs" -> f2DateTime,
    "f2b_date_more" -> f2bDateMore,
    "f3_math_funcs" -> f3Math,
    "f3b_histogram" -> f3bHistogram,
    "f4_conditional_funcs" -> f4Conditional,
    "f5_array_funcs" -> f5Array,
    "f5_explode_tf" -> f5Explode,
    "f6_json_funcs" -> f6Json,
    "f6c_variant" -> f6cVariant,
    "f2c_gap_fill" -> f2cGapFill,
    "f6b_map_funcs" -> f6bMapFuncs,
    "f7_hash_funcs" -> f7Hash)

  override def oracles: Map[String, String] = Map(
    "f1_string_funcs" -> f1Oracle,
    "f1b_string_more" -> f1bOracle,
    "f2_datetime_funcs" -> f2Oracle,
    "f2b_date_more" -> f2bOracle,
    "f3_math_funcs" -> f3Oracle,
    "f3b_histogram" -> f3bOracle,
    "f4_conditional_funcs" -> f4Oracle,
    "f5_array_funcs" -> f5Oracle,
    "f5_explode_tf" -> f5ExplodeOracle,
    "f6_json_funcs" -> f6Oracle,
    "f6c_variant" -> f6cOracle,
    "f2c_gap_fill" -> f2cOracle,
    "f6b_map_funcs" -> f6bOracle,
    "f7_hash_funcs" -> f7Oracle)
}
