package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators J1–J7 (SURVEY.md §2.3) over the testdata star.
  *
  * Scale notes: fact⋈fact joins (orders⋈lineitem) shuffle on the join
  * key — both sides hash-partition, AQE handles skew. Dimension joins
  * (part, nation, region, supplier) are broadcast: explicit hint where
  * the dim is bounded by schema (region/nation), AQE auto-broadcast
  * otherwise. The as-of join (J7) is the scalable union+window form:
  * ONE shuffle on the key, no per-row range probe — this survives
  * 100 TB where a naive theta-join (J6's shape) would not.
  */
object Joins extends QueryModule {

  /** J1: inner equi-join fact⋈fact — shuffle join, partial agg after. */
  def j1InnerJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Q.t(spark, dir, "orders")
    val l = Q.t(spark, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_lines"),
        Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("o_orderstatus").asc)
  }

  val j1Oracle: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n_lines, ${Q.sql.revenueSum()} AS revenue
       |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus ASC NULLS FIRST""".stripMargin

  /** J2: broadcast hash join fact⋈dim — no shuffle of the fact side. */
  def j2BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Q.t(spark, dir, "lineitem")
    val p = Q.t(spark, dir, "part").select("p_partkey", "p_type")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_type"))
      .agg(
        Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_type").asc)
  }

  val j2Oracle: String =
    s"""SELECT p_type, ${Q.sql.revenueSum()} AS revenue, COUNT(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_type
       |ORDER BY p_type ASC NULLS FIRST""".stripMargin

  /** J3: left outer join — dims with no facts survive with zeroed aggs. */
  def j3LeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val p = Q.t(spark, dir, "part").select("p_partkey", "p_brand")
    val l = Q.t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 40)
      .select("l_partkey", "l_orderkey", "l_quantity")
    p.join(l, p("p_partkey") === l("l_partkey"), "left")
      .groupBy(col("p_partkey"), col("p_brand"))
      .agg(
        count(col("l_orderkey")).as("n_bulk_lines"),
        coalesce(Q.dsum(col("l_quantity")), lit(0.0)).as("bulk_qty"))
      .orderBy(col("p_partkey").asc)
  }

  val j3Oracle: String =
    s"""SELECT p_partkey, p_brand, COUNT(l_orderkey) AS n_bulk_lines,
       |  COALESCE(${Q.sql.dsum("l_quantity")}, 0.0) AS bulk_qty
       |FROM part LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 40) li
       |  ON p_partkey = l_partkey
       |GROUP BY p_partkey, p_brand
       |ORDER BY p_partkey ASC NULLS FIRST""".stripMargin

  /** J4a: left semi join — EXISTS without duplicating the left side. */
  def j4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Q.t(spark, dir, "customer")
    val bigOrders = Q.t(spark, dir, "orders").filter(col("o_totalprice") > 300000.0)
    c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy(col("c_custkey").asc)
  }

  val j4SemiOracle: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
      |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin

  /** J4b: left anti join — NOT EXISTS (orphan / DQ check shape). */
  def j4AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Q.t(spark, dir, "customer")
    val o = Q.t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey").asc)
  }

  val j4AntiOracle: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey ASC NULLS FIRST""".stripMargin

  /** J5: multi-way star join (TPC-H-Q5-shaped) — one fact⋈fact shuffle,
    * all dims broadcast, local-supplier condition on nationkey.
    */
  def j5StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Q.t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Q.t(spark, dir, "nation")
    val customer = Q.t(spark, dir, "customer")
    val orders = Q.t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val lineitem = Q.t(spark, dir, "lineitem")
    val supplier = Q.t(spark, dir, "supplier")

    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"))
      .join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"))
      .join(broadcast(supplier), lineitem("l_suppkey") === supplier("s_suppkey") &&
        customer("c_nationkey") === supplier("s_nationkey"))
      .join(broadcast(nation), supplier("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(Q.revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val j5Oracle: String =
    s"""SELECT n_name, ${Q.sql.revenueSum()} AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON o_orderkey = l_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1999-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS FIRST""".stripMargin

  /** J6: range join — equi key (user) + time-band condition. The equi
    * key keeps this a hash/SMJ join with a residual range predicate,
    * not a cartesian product.
    */
  def j6RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    purchases
      .join(clicks, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
      .groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("clicks_before_purchase"))
      .orderBy(col("user_id").asc)
  }

  val j6Oracle: String =
    """SELECT p.user_id AS user_id, COUNT(*) AS clicks_before_purchase
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |GROUP BY p.user_id
      |ORDER BY user_id ASC NULLS FIRST""".stripMargin

  /** J6b: the same range join, TIME-BUCKETED — the bounded-state batch
    * analogue of T7's stream-stream interval join. The band predicate
    * `c_ts ∈ [p_ts − 1h, p_ts)` means a purchase in hour-bucket B can
    * only match clicks in buckets B−1 or B, so each click row is
    * exploded to its two candidate buckets and the join key becomes
    * (user, bucket) — an ordinary equi-join with the exact band as
    * residual. Same rows as [[j6RangeJoin]] bit-for-bit (same oracle
    * gates both). Why it matters at 100 TB: the per-key work of the
    * plain form is |purchases(u)|·|clicks(u)| over a user's WHOLE
    * history; bucketing makes it |purchases(u,h)|·|clicks(u,h±1)| —
    * bounded by activity per hour, immune to long-lived power users,
    * and the (user, bucket) key gives AQE far finer skew-split grain.
    * Each (purchase, click) pair matches exactly one exploded bucket
    * (cbkt vs cbkt+1 are distinct), so no dedup step is needed.
    */
  def j6bBucketedRange(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        floor(unix_timestamp(col("ts")) / 3600L).as("bkt"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        floor(unix_timestamp(col("ts")) / 3600L).as("cbkt"))
      .withColumn("bkt", explode(array(col("cbkt"), col("cbkt") + 1)))
    purchases
      .join(clicks, col("p_user") === col("c_user") &&
        purchases("bkt") === clicks("bkt") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
      .groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("clicks_before_purchase"))
      .orderBy(col("user_id").asc)
  }

  /** J7: as-of join (latest click at-or-before each purchase), in the
    * scalable union+window form: tag both sides, one shuffle+sort per
    * user, carry the last click ts forward with last(ignoreNulls).
    * Equivalent to DuckDB ASOF LEFT JOIN. At 100 TB this is the right
    * plan: no per-row backward probe, single exchange on the key.
    */
  def j7AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val tagged = ev
      .filter(col("event_type").isin("purchase", "click"))
      .select(
        col("event_id"), col("user_id"), col("ts"),
        col("event_type"),
        when(col("event_type") === "click", col("ts")).as("click_ts_src"))
    // clicks sort before purchases at equal ts so ts-equal clicks match
    // (ASOF >= semantics).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_type").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged
      .withColumn("last_click_ts", last(col("click_ts_src"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
      .orderBy(col("event_id").asc)
  }

  val j7Oracle: String =
    """SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id ASC NULLS FIRST""".stripMargin

  /** J7b: FORWARD as-of join with tolerance (pandas merge_asof
    * direction='forward', tolerance=2h): for each purchase, the next
    * click strictly after it, kept only when within 2 hours — the
    * attribution window variant of J7's backward as-of. Same
    * single-sort shape: a conditional MIN over the FOLLOWING frame
    * replaces a range self-join; the tolerance is a post-filter on the
    * matched timestamp, which preserves the left row (NULL match)
    * exactly like merge_asof.
    */
  def j7bAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val tagged = ev
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        when(col("event_type") === "click", col("ts")).as("click_ts_src"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_type").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    tagged
      .withColumn("next_click_raw",
        min(col("click_ts_src")).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("next_click_ts",
        when(col("next_click_raw") <= col("ts") + expr("INTERVAL 2 HOURS"),
          col("next_click_raw")))
      .select(col("event_id"), col("user_id"), col("ts"), col("next_click_ts"))
      .orderBy(col("event_id").asc)
  }

  val j7bOracle: String =
    """SELECT event_id, user_id, ts,
      |  CASE WHEN next_click_raw <= ts + INTERVAL 2 HOUR
      |       THEN next_click_raw END AS next_click_ts
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) OVER w AS next_click_raw
      |  FROM events
      |  WHERE event_type IN ('purchase', 'click')
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS FIRST, event_type ASC NULLS FIRST,
      |             event_id ASC NULLS FIRST
      |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
      |WHERE event_type = 'purchase'
      |ORDER BY event_id ASC NULLS FIRST""".stripMargin

  /** J9: null-safe equi-join (`<=>` / IS NOT DISTINCT FROM) — NULL
    * keys MATCH each other instead of silently dropping, the semantics
    * CDC diffs and dimension lookups with unknown members need. Region
    * key 0 is nulled on both sides to exercise the null bucket.
    */
  def j9NullSafe(spark: SparkSession, dir: String): DataFrame = {
    val n = Q.t(spark, dir, "nation")
      .withColumn("k", nullif(col("n_regionkey"), lit(0)))
    val r = Q.t(spark, dir, "region")
      .withColumn("k", nullif(col("r_regionkey"), lit(0)))
    n.as("n").join(r.as("r"), col("n.k") <=> col("r.k"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy(col("n_nationkey").asc)
  }

  val j9Oracle: String =
    """SELECT n_nationkey, n_name, r_name
      |FROM (SELECT *, nullif(n_regionkey, 0) AS k FROM nation) n
      |JOIN (SELECT *, nullif(r_regionkey, 0) AS k FROM region) r
      |  ON n.k IS NOT DISTINCT FROM r.k
      |ORDER BY n_nationkey ASC NULLS FIRST""".stripMargin

  /** J10: hot-key-split skew join — lineitem⋈supplier on suppkey with
    * the hot set routed through a broadcast leg and the cold remainder
    * through the normal shuffle (threshold forced low so the split
    * actually engages at test scale). The oracle is the PLAIN join:
    * the split must be row-for-row invisible in the result — only the
    * plan changes.
    */
  def j10SkewSplit(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Salting
    val li = Q.t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_quantity"))
    val supp = Q.t(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    Salting.hotKeySplitJoin(li, supp, Seq("l_suppkey"), hotThreshold = 50L)
      .groupBy(col("l_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_items"), Q.dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_suppkey").asc)
  }

  val j10Oracle: String =
    s"""SELECT l_suppkey, s_name, COUNT(*) AS n_items,
       |  ${Q.sql.dsum("l_quantity")} AS qty
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY l_suppkey, s_name
       |ORDER BY l_suppkey ASC NULLS FIRST""".stripMargin

  /** J11: full outer join — the symmetric-diff report (customers'
    * order activity in 1996 vs 1997: retained / churned / added, with
    * both-sides-unmatched rows surfaced). The one legitimate home of
    * FullOuter in the engine: BOTH inputs are already per-key
    * aggregates (bounded by |customers|), so the join is between two
    * reduced frames hash-partitioned on the same key — never a
    * full-outer shuffle of raw fact rows (the MERGE path deliberately
    * avoids that shape, `lake/Merge.scala`).
    */
  def j11FullOuter(spark: SparkSession, dir: String): DataFrame = {
    def feed(yr: Int) = Q.t(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === yr)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as(s"n_$yr"),
        Q.dsum(col("o_totalprice")).as(s"spend_$yr"))
    feed(1996).join(feed(1997), Seq("o_custkey"), "full_outer")
      .withColumn("status",
        when(col("n_1996").isNull, lit("added"))
          .when(col("n_1997").isNull, lit("churned"))
          .otherwise(lit("retained")))
      .orderBy(col("o_custkey").asc)
  }

  val j11Oracle: String =
    s"""WITH a AS (
       |  SELECT o_custkey, COUNT(*) AS n_1996,
       |    ${Q.sql.dsum("o_totalprice")} AS spend_1996
       |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
       |b AS (
       |  SELECT o_custkey, COUNT(*) AS n_1997,
       |    ${Q.sql.dsum("o_totalprice")} AS spend_1997
       |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1)
       |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
       |  n_1996, spend_1996, n_1997, spend_1997,
       |  CASE WHEN n_1996 IS NULL THEN 'added'
       |       WHEN n_1997 IS NULL THEN 'churned'
       |       ELSE 'retained' END AS status
       |FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
       |ORDER BY o_custkey ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j9_null_safe" -> j9NullSafe,
    "j11_full_outer" -> j11FullOuter,
    "j10_skew_split" -> j10SkewSplit,
    "j1_inner_join" -> j1InnerJoin,
    "j2_broadcast_join" -> j2BroadcastJoin,
    "j3_left_outer" -> j3LeftOuter,
    "j4_semi_join" -> j4SemiJoin,
    "j4_anti_join" -> j4AntiJoin,
    "j5_star_join" -> j5StarJoin,
    "j6_range_join" -> j6RangeJoin,
    "j6b_bucketed_range" -> j6bBucketedRange,
    "j7_asof_join" -> j7AsofJoin,
    "j7b_asof_forward" -> j7bAsofForward)

  override def oracles: Map[String, String] = Map(
    "j10_skew_split" -> j10Oracle,
    "j11_full_outer" -> j11Oracle,
    "j1_inner_join" -> j1Oracle,
    "j2_broadcast_join" -> j2Oracle,
    "j3_left_outer" -> j3Oracle,
    "j4_semi_join" -> j4SemiOracle,
    "j4_anti_join" -> j4AntiOracle,
    "j5_star_join" -> j5Oracle,
    "j6_range_join" -> j6Oracle,
    "j6b_bucketed_range" -> j6Oracle, // identical semantics, bucketed plan
    "j7_asof_join" -> j7Oracle,
    "j7b_asof_forward" -> j7bOracle,
    "j9_null_safe" -> j9Oracle)
}
