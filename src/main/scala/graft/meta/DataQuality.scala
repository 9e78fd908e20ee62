package graft.meta

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality rules for the bronze→silver boundary — the checks the
  * reference's data demands (SURVEY.md §1.3): referential integrity
  * (every order_items.order_id in that day's orders; repaired product
  * key coverage), null-rate budgets (days_since_prior_order), value
  * ranges (total_amount ∈ [5, 50]), and uniqueness (order_id per day).
  *
  * Each check is one aggregate/anti-join — a single pass or one keyed
  * shuffle; results collect into a tiny report DataFrame (bounded by
  * the number of checks, never by data size).
  */
object DataQuality {

  case class CheckResult(check: String, passed: Boolean, violations: Long,
      detail: String)

  /** FK orphans: rows of `child` whose `key` has no match in `parent`.
    * NULL child keys are vacuously valid (SQL FK semantics — the
    * left_anti's plain equality would otherwise count every distinct
    * NULL as an orphan); budget NULLs separately with [[nullRate]].
    */
  def referentialIntegrity(child: DataFrame, parent: DataFrame,
      key: String): CheckResult = {
    val orphans = child.select(key).filter(col(key).isNotNull).distinct()
      .join(parent.select(key).distinct(), Seq(key), "left_anti").count()
    CheckResult(s"ri:$key", orphans == 0, orphans,
      s"$orphans orphan $key values")
  }

  /** Null-rate budget on a column. */
  def nullRate(df: DataFrame, column: String, maxRate: Double): CheckResult = {
    val row = df.agg(
      count(lit(1)).as("n"),
      count(when(col(column).isNull, 1)).as("nulls")).head()
    val (n, nulls) = (row.getLong(0), row.getLong(1))
    val rate = if (n == 0) 0.0 else nulls.toDouble / n
    CheckResult(s"nullrate:$column", rate <= maxRate, nulls,
      f"$rate%.4f null rate (budget $maxRate%.4f)")
  }

  /** Closed value-range check. */
  def valueRange(df: DataFrame, column: String, lo: Double, hi: Double): CheckResult = {
    val out = df.filter(col(column) < lo || col(column) > hi).count()
    CheckResult(s"range:$column", out == 0, out,
      s"$out values outside [$lo, $hi]")
  }

  /** Key uniqueness (optionally within a partition column). */
  def unique(df: DataFrame, key: String, within: Option[String] = None): CheckResult = {
    val groups = within.map(w => Seq(col(w), col(key))).getOrElse(Seq(col(key)))
    val dups = df.groupBy(groups: _*).count().filter(col("count") > 1).count()
    CheckResult(s"unique:$key${within.fold("")(w => s"/$w")}", dups == 0, dups,
      s"$dups duplicated keys")
  }

  /** Run checks and return the report as a DataFrame. */
  def report(spark: SparkSession, checks: Seq[CheckResult]): DataFrame = {
    import spark.implicits._
    checks.toDF()
  }
}
