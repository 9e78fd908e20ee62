package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshaping operators — pivot/unpivot, value-range window frames, and
  * positional explode. Rounds out the OLAP surface beyond SURVEY §2's
  * named rows (gold-zone reports pivot by status; melt is its inverse
  * for normalized sinks).
  *
  * Scale notes: pivot with an explicit value list is ONE hash
  * aggregate (no second pass to discover values — at 100 TB the
  * implicit-values form would scan twice); unpivot is a narrow
  * generator (no shuffle); range frames sort within partitions only.
  */
object Reshape extends QueryModule {

  private val Statuses = Seq("O", "F", "P")

  /** R1: PIVOT — status columns per priority, explicit value list so
    * the plan is a single aggregate. Null cells (empty groups) surface
    * as 0 to keep both engines' representation identical.
    */
  def r1Pivot(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Statuses)
      .agg(Q.dsum(col("o_totalprice")))
      .select(col("o_orderpriority") +:
        Statuses.map(s => coalesce(col(s), lit(0.0)).as(s"sum_${s.toLowerCase}")): _*)
      .orderBy(col("o_orderpriority").asc)

  val r1Oracle: String = {
    val cols = Statuses.map { s =>
      s"""COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
         |    FILTER (WHERE o_orderstatus = '$s') AS DOUBLE), 0.0)
         |    AS sum_${s.toLowerCase}""".stripMargin
    }.mkString(",\n  ")
    s"""SELECT o_orderpriority,
       |  $cols
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority ASC NULLS FIRST""".stripMargin
  }

  /** R2: UNPIVOT (melt) — the inverse reshape: wide status columns back
    * to (priority, status, total) rows via Dataset.unpivot.
    */
  def r2Unpivot(spark: SparkSession, dir: String): DataFrame =
    r1Pivot(spark, dir)
      .unpivot(
        Array(col("o_orderpriority")),
        Statuses.map(s => col(s"sum_${s.toLowerCase}")).toArray,
        "status", "total")
      .orderBy(col("o_orderpriority").asc, col("status").asc)

  val r2Oracle: String = {
    val branches = Statuses.map { s =>
      s"""SELECT o_orderpriority, 'sum_${s.toLowerCase}' AS status,
         |  sum_${s.toLowerCase} AS total FROM wide""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH wide AS ($r1Oracle)
       |$branches
       |ORDER BY o_orderpriority ASC NULLS FIRST, status ASC NULLS FIRST""".stripMargin
  }

  /** W3b: value-RANGE window frame — trailing 3-day revenue per
    * priority, peers included by ORDER-BY VALUE (not row position):
    * the frame every rows-frame query gets wrong when days have
    * varying row counts.
    */
  def w3RangeByValue(spark: SparkSession, dir: String): DataFrame = {
    // a RANGE frame's peers share identical frames, so the per-row
    // window value is a function of (priority, day) alone — compute it
    // on the DAY-GRAIN frame (priorities × days, calendar-bounded —
    // it does NOT grow with corpus size) and broadcast-join it back,
    // instead of sorting all raw orders per 5-value priority in single
    // tasks. Decimal partial sums are exact, so per-day totals summed
    // over the day window are bit-identical to the raw-row window.
    val rows = Q.t(spark, dir, "orders")
      .withColumn("ord_day",
        datediff(col("o_orderdate"), lit("1992-01-01").cast(DateType)))
    val dayAgg = rows.groupBy(col("o_orderpriority"), col("ord_day"))
      .agg(sum(col("o_totalprice").cast(Q.Dec)).as("day_total"),
        count(lit(1)).as("day_n"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("ord_day"))
      .rangeBetween(-3, 0)
    // null-safe join back: null-priority / null-day rows are their own
    // window groups in the raw form, so they must rejoin their own
    // day-grain rows rather than silently dropping
    val trail = dayAgg.select(
      col("o_orderpriority").as("_t_prio"), col("ord_day").as("_t_day"),
      sum(col("day_total")).over(w).cast(DoubleType).as("trail3d_total"),
      sum(col("day_n")).over(w).as("trail3d_n"))
    rows.join(broadcast(trail),
        col("o_orderpriority") <=> col("_t_prio") &&
          col("ord_day") <=> col("_t_day"))
      .select(
        col("o_orderkey"), col("o_orderpriority"), col("ord_day"),
        col("trail3d_total"), col("trail3d_n"))
      .orderBy(col("o_orderkey").asc)
  }

  val w3RangeOracle: String =
    """WITH days AS (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice,
      |    CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS INT) AS ord_day
      |  FROM orders)
      |SELECT o_orderkey, o_orderpriority, ord_day,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_orderpriority ORDER BY ord_day
      |    RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail3d_total,
      |  COUNT(*) OVER (
      |    PARTITION BY o_orderpriority ORDER BY ord_day
      |    RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS trail3d_n
      |FROM days
      |ORDER BY o_orderkey ASC NULLS FIRST""".stripMargin

  /** X3b: posexplode — token position survives the fan-out (the
    * generator form sequence labeling / n-gram windows need).
    */
  def f5Posexplode(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "token")
      .orderBy(col("doc_id").asc, col("pos").asc)

  val f5PosexplodeOracle: String =
    """SELECT doc_id, CAST(r['pos'] AS INT) AS pos, r['token'] AS token
      |FROM (
      |  SELECT doc_id,
      |    unnest(list_transform(string_split(text, ' '),
      |      (x, i) -> {'pos': i - 1, 'token': x})) AS r
      |  FROM documents WHERE doc_id < 20)
      |ORDER BY doc_id ASC NULLS FIRST, pos ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_pivot" -> r1Pivot,
    "r2_unpivot" -> r2Unpivot,
    "w3_range_by_value" -> w3RangeByValue,
    "f5_posexplode" -> f5Posexplode)

  override def oracles: Map[String, String] = Map(
    "r1_pivot" -> r1Oracle,
    "r2_unpivot" -> r2Oracle,
    "w3_range_by_value" -> w3RangeOracle,
    "f5_posexplode" -> f5PosexplodeOracle)
}
