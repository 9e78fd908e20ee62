package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over `events` — the gold-zone reports a
  * retail lakehouse actually serves: conversion funnels, cohort
  * retention, and table profiling (DQ summary). All exact arithmetic
  * (counts, mins, day buckets) — no FP aggregation order issues.
  *
  * Scale notes: fn1/fn2 are one hash-agg shuffle each on user_id (the
  * natural high-cardinality key — no skew), then a bounded-cardinality
  * re-aggregate; pr1 is a single full-scan aggregate with partial
  * combine (one row out per column).
  */
object Analytics extends QueryModule {

  /** FN1: conversion funnel — per-user first timestamp of each stage,
    * then stage-ordered conversion counts (view → click → purchase:
    * a stage counts only if it happens AFTER the prior stage).
    */
  def fn1Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val stages = ev.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    stages.agg(
      count(col("t_view")).as("n_viewed"),
      count(when(col("t_click") > col("t_view"), lit(1))).as("n_clicked_after_view"),
      count(when(col("t_purchase") > col("t_click") &&
        col("t_click") > col("t_view"), lit(1))).as("n_full_funnel"),
      count(lit(1)).as("n_users"))
  }

  val fn1Oracle: String =
    """WITH stages AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
      |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(t_view) AS n_viewed,
      |  COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_clicked_after_view,
      |  COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END) AS n_full_funnel,
      |  COUNT(*) AS n_users
      |FROM stages""".stripMargin

  /** FN2: cohort retention — users grouped by first-activity day,
    * counted per day-offset of subsequent activity (the retention
    * triangle). Day arithmetic only; exact.
    */
  def fn2Cohorts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(first, Seq("user_id"))
      .withColumn("offset", datediff(col("day"), col("cohort_day")))
      .groupBy(col("cohort_day"), col("offset"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .filter(col("offset") <= 7)
      .orderBy(col("cohort_day").asc, col("offset").asc)
  }

  val fn2Oracle: String =
    """WITH activity AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |first AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id)
      |SELECT cohort_day,
      |  CAST(datediff('day', cohort_day, day) AS INT) AS "offset",
      |  COUNT(DISTINCT a.user_id) AS active_users
      |FROM activity a JOIN first USING (user_id)
      |WHERE datediff('day', cohort_day, day) <= 7
      |GROUP BY 1, 2
      |ORDER BY cohort_day ASC NULLS FIRST, "offset" ASC NULLS FIRST""".stripMargin

  /** PR1: table profile — the DQ summary a catalog publishes per
    * column: counts, null budget, distincts, bounds. One scan, one
    * row; every stat is exact.
    */
  def pr1Profile(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "events")
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("value").isNull.cast("long")).as("value_nulls"),
        min(col("ts")).as("ts_min"),
        max(col("ts")).as("ts_max"),
        Q.dsum(col("value")).as("value_total"))

  val pr1Oracle: String =
    s"""SELECT COUNT(*) AS n_rows,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  COUNT(DISTINCT event_type) AS n_types,
       |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
       |  MIN(ts) AS ts_min, MAX(ts) AS ts_max,
       |  ${Q.sql.dsum("value")} AS value_total
       |FROM events""".stripMargin

  /** FN3: market-basket co-purchase — part pairs sharing an order,
    * scored by lift = P(a,b) / (P(a)·P(b)) in exact rational form
    * (pair_n · n_orders) / (cnt_a · cnt_b). Self-join on the order key
    * — the basket key, bounded fan-out (baskets are small). The
    * per-order cost is quadratic in basket size, so `maxBasket` caps
    * each basket before the self-join: keep the `maxBasket`
    * hash-ranked items per order (rank by xxhash64(partkey), partkey —
    * deterministic, no RNG, unbiased w.r.t. part identity). A single
    * 100k-item mega-basket at 100 TB would otherwise emit 5e9 pairs
    * from one key — the classic skew bomb. Default ∞ (exact, oracle
    * form); the cap bounds pairs at orders·maxBasket²/2.
    */
  def fn3CoPurchase(spark: SparkSession, dir: String,
      maxBasket: Int = Int.MaxValue): DataFrame = {
    val distinctItems = Q.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val items = capBaskets(distinctItems, "l_orderkey", "l_partkey", maxBasket)
    val nOrders = Q.t(spark, dir, "orders").agg(
      countDistinct(col("o_orderkey")).as("n_orders"))
    val cnt = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= 3)
    pairs
      .join(cnt.select(col("l_partkey").as("part_a"), col("cnt").as("cnt_a")), Seq("part_a"))
      .join(cnt.select(col("l_partkey").as("part_b"), col("cnt").as("cnt_b")), Seq("part_b"))
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("pair_n") * col("n_orders")).cast("double")
          / (col("cnt_a") * col("cnt_b")).cast("double"))
      .select("part_a", "part_b", "pair_n", "lift")
      .orderBy(col("pair_n").desc, col("part_a").asc, col("part_b").asc)
      .limit(25)
  }

  /** Cap each basket at its `maxBasket` hash-ranked items — the skew
    * guard in front of any per-basket self-join. Rank by
    * (xxhash64(item), item): deterministic across runs and executors,
    * no RNG, unbiased w.r.t. item identity (a min-wise sample of the
    * basket). `maxBasket = Int.MaxValue` is the identity — no window,
    * no shuffle added to the exact path.
    */
  def capBaskets(items: DataFrame, keyCol: String, itemCol: String,
      maxBasket: Int): DataFrame =
    if (maxBasket == Int.MaxValue) items
    else {
      val w = Window.partitionBy(col(keyCol))
        .orderBy(xxhash64(col(itemCol)).asc, col(itemCol).asc)
      items.withColumn("_r", row_number().over(w))
        .filter(col("_r") <= maxBasket).drop("_r")
    }

  val fn3Oracle: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT COUNT(DISTINCT o_orderkey) AS n_orders FROM orders),
      |cnt AS (SELECT l_partkey, COUNT(*) AS cnt FROM items GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS pair_n
      |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 3)
      |SELECT part_a, part_b, pair_n,
      |  CAST(pair_n * n.n_orders AS DOUBLE)
      |    / CAST(ca.cnt * cb.cnt AS DOUBLE) AS lift
      |FROM pairs
      |JOIN cnt ca ON ca.l_partkey = part_a
      |JOIN cnt cb ON cb.l_partkey = part_b
      |CROSS JOIN n
      |ORDER BY pair_n DESC NULLS LAST, part_a ASC NULLS FIRST,
      |  part_b ASC NULLS FIRST
      |LIMIT 25""".stripMargin

  /** PR2: join-key skew diagnostic — the per-key histogram summary a
    * 100 TB pipeline computes BEFORE a big join to decide whether to
    * salt / AQE-split: distinct keys, hottest key (with its count),
    * mean rows per key, and the max/mean skew ratio. Two partial-agg
    * levels; the second input is one row per key, never raw rows.
    */
  def pr2SkewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = Q.t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
    val hot = counts
      .orderBy(col("n").desc, col("l_suppkey").asc).limit(1)
      .select(col("l_suppkey").as("hottest_key"), col("n").as("hottest_rows"))
    counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_rows"),
      round(sum(col("n")).cast("double") / count(lit(1)), 6).as("mean_rows"),
      round(max(col("n")).cast("double") /
        (sum(col("n")).cast("double") / count(lit(1))), 6).as("skew_ratio"))
      .crossJoin(hot)
  }

  val pr2Oracle: String =
    """WITH cnt AS (
      |  SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |hot AS (
      |  SELECT l_suppkey AS hottest_key, n AS hottest_rows FROM cnt
      |  ORDER BY n DESC NULLS LAST, l_suppkey ASC NULLS FIRST LIMIT 1)
      |SELECT COUNT(*) AS n_keys,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  MAX(n) AS max_rows,
      |  round(CAST(SUM(n) AS DOUBLE) / COUNT(*), 6) AS mean_rows,
      |  round(CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / COUNT(*)), 6)
      |    AS skew_ratio,
      |  hot.hottest_key, hot.hottest_rows
      |FROM cnt CROSS JOIN hot
      |GROUP BY hot.hottest_key, hot.hottest_rows""".stripMargin

  /** FN4: gap-based sessionization — the batch form of T3's session
    * window: a user's events split into sessions wherever the gap to
    * the previous event exceeds 30 minutes; per-session start/end,
    * event count, and exact value sum. The classic two-window shape:
    * lag to mark boundaries, running sum of boundary marks to number
    * sessions — both over the SAME (user_id, ts) sort, so Spark plans
    * ONE shuffle + one sort for the whole thing.
    *
    * Scale: partitioned by user_id (high-cardinality, unskewed);
    * session numbering never crosses partitions, so no global
    * coordination. Timestamp arithmetic is integer microseconds —
    * exact, oracle-safe.
    */
  def fn4Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Q.dsum(col("value")).as("session_value"))
      .orderBy(col("user_id").asc, col("session_seq").asc)
  }

  val fn4Oracle: String =
    """WITH marked AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |numbered AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id
      |      ORDER BY ts ASC, event_id ASC) AS BIGINT) AS session_seq
      |  FROM marked)
      |SELECT user_id, session_seq,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
      |FROM numbered
      |GROUP BY user_id, session_seq
      |ORDER BY user_id ASC NULLS FIRST, session_seq ASC NULLS FIRST""".stripMargin

  /** PR3: equi-DEPTH histogram (quantile binning) of order values —
    * the feature-discretization / data-profiling partner to F3b's
    * equi-width buckets: 8 bins holding ~equal row counts, each
    * reported with its row count and value bounds.
    *
    * Binning is VALUE-functional, not ntile: a value's bin is
    * floor(rows-strictly-below · B / N), so ties land in one bin and
    * the result is independent of sort-tie order — the property that
    * makes it cross-engine exact (all-integer math). The cumulative
    * pass runs on the DISTINCT-VALUE frame (after a keyed count agg),
    * not the raw rows; at extreme cardinality the cutpoints swap for
    * approx_percentile and the same bin-assignment join remains.
    */
  def pr3EqdepthHist(spark: SparkSession, dir: String): DataFrame = {
    val bins = 8
    val grouped = Q.t(spark, dir, "orders")
      .groupBy(col("o_totalprice").as("v")).agg(count(lit(1)).as("c"))
    val tot = grouped.agg(sum(col("c")).as("N"))
    // rows-below is a GLOBAL cumsum: as a Window.orderBy it plans
    // Exchange SinglePartition over the distinct-value frame, which at
    // scale is nearly the row count (prices are continuous) — the
    // same shape a13 sheds. PrefixSum computes the identical exclusive
    // prefix count distributed.
    // statsOf = raw projection: probing `grouped` would re-run the agg
    graft.operators.PrefixSum.exclusive(grouped, Nil, "v", Seq("c" -> "f"),
        statsOf = Some(Q.t(spark, dir, "orders")
          .select(col("o_totalprice").as("v"))))
      .crossJoin(broadcast(tot))
      .withColumn("bin",
        least(expr(s"(f * $bins) div N"), lit(bins - 1L)).cast("int"))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("n_rows"), min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy(col("bin").asc)
  }

  val pr3Oracle: String =
    """WITH g AS (SELECT o_totalprice AS v, COUNT(*) AS c FROM orders GROUP BY 1),
      |tot AS (SELECT SUM(c) AS N FROM g),
      |b AS (SELECT v, c,
      |  COALESCE(SUM(c) OVER (ORDER BY v ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
      |  FROM g),
      |binned AS (
      |  SELECT v, c, CAST(LEAST((f * 8) // N, 7) AS INT) AS bin
      |  FROM b CROSS JOIN tot)
      |SELECT bin, CAST(SUM(c) AS BIGINT) AS n_rows, MIN(v) AS lo, MAX(v) AS hi
      |FROM binned GROUP BY bin
      |ORDER BY bin ASC NULLS FIRST""".stripMargin

  /** FN5: sequential event-pattern detection (MATCH_RECOGNIZE-lite):
    * purchases preceded by a view within 1 hour with NO error between
    * the view and the purchase — the A→B-within-T-unless-C shape every
    * CEP engine sells. One pass, no self-join: per user-ordered
    * window, the running last-view and last-error timestamps
    * (conditional MAX over the preceding frame) decide the pattern at
    * each purchase row.
    *
    * Scale: one (user_id, ts) sort — same shuffle class as fn4; the
    * conditional-extrema frames are O(1) state per row. Timestamp
    * arithmetic is integer microseconds.
    */
  def fn5Pattern(spark: SparkSession, dir: String): DataFrame = {
    val ev = Q.t(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_view",
        max(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("last_error",
        max(when(col("event_type") === "error", col("ts"))).over(w))
      .filter(col("event_type") === "purchase" &&
        col("last_view").isNotNull &&
        col("ts") <= col("last_view") + expr("INTERVAL 1 HOUR") &&
        (col("last_error").isNull || col("last_error") < col("last_view")))
      .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
        col("last_view").as("view_ts"))
      .orderBy(col("user_id").asc, col("event_id").asc)
  }

  val fn5Oracle: String =
    """SELECT user_id, event_id, ts AS purchase_ts, last_view AS view_ts
      |FROM (
      |  SELECT user_id, event_id, ts, event_type,
      |    MAX(CASE WHEN event_type = 'view' THEN ts END) OVER w AS last_view,
      |    MAX(CASE WHEN event_type = 'error' THEN ts END) OVER w AS last_error
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |    ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |WHERE event_type = 'purchase'
      |  AND last_view IS NOT NULL
      |  AND ts <= last_view + INTERVAL 1 HOUR
      |  AND (last_error IS NULL OR last_error < last_view)
      |ORDER BY user_id ASC NULLS FIRST, event_id ASC NULLS FIRST""".stripMargin

  /** FN6: daily + trailing-7-day active users per event type (the
    * DAU/WAU report) — the sliding-window COUNT DISTINCT operator,
    * which Spark windows cannot express natively (COUNT(DISTINCT)
    * OVER is unsupported). The scalable form: dedup to (type, day,
    * user) grain FIRST (one shuffle, the big one), then a
    * broadcast day-grid range join fans each daily-user row to the ≤7
    * report days it supports, and a keyed exact distinct count
    * finishes. Never a per-row window over raw events.
    */
  def fn6Wau(spark: SparkSession, dir: String): DataFrame = {
    val daily = Q.t(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val dau = daily.groupBy(col("event_type"), col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val grid = daily.select(col("event_type"), col("day")).distinct()
      .withColumnRenamed("day", "report_day")
    val wau = grid.join(daily,
        grid("event_type") === daily("event_type") &&
          col("day").between(date_sub(col("report_day"), 6), col("report_day")))
      .groupBy(grid("event_type").as("event_type"), col("report_day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .withColumnRenamed("report_day", "day")
    dau.join(wau, Seq("event_type", "day"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  val fn6Oracle: String =
    """WITH daily AS (
      |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
      |  FROM events),
      |dau AS (
      |  SELECT event_type, day, COUNT(DISTINCT user_id) AS dau
      |  FROM daily GROUP BY 1, 2),
      |grid AS (SELECT DISTINCT event_type, day AS report_day FROM daily),
      |wau AS (
      |  SELECT g.event_type, g.report_day AS day,
      |    COUNT(DISTINCT d.user_id) AS wau
      |  FROM grid g JOIN daily d
      |    ON g.event_type = d.event_type
      |   AND d.day BETWEEN g.report_day - INTERVAL 6 DAY AND g.report_day
      |  GROUP BY 1, 2)
      |SELECT dau.event_type, dau.day, dau, wau
      |FROM dau JOIN wau ON dau.event_type = wau.event_type AND dau.day = wau.day
      |ORDER BY dau.event_type ASC NULLS FIRST, dau.day ASC NULLS FIRST""".stripMargin

  /** FN7: approximate WAU from MERGEABLE daily sketches — fn6's true
    * 100 TB shape: the raw events table is scanned ONCE into per-(type,
    * day) HLL sketches (the tiny frame a gold layer persists), and any
    * trailing window's distinct count is a sketch UNION over ≤7 rows —
    * O(report cells) merge work, never a re-scan, and yesterday's
    * sketches never recompute. ApproxDistinctSpec bounds the error
    * against fn6's exact counts at any scale; AT THE GATE SCALE the
    * query is oracle-EXACT: DataSketches HLL counts coupons exactly
    * until the sparse→dense promotion (~512 distincts at lgK=12), and
    * the max 7-day WAU at sf0.01 is ~150 — so hll_sketch_estimate IS
    * COUNT(DISTINCT) there and the DuckDB oracle pins it bit-exactly.
    */
  def fn7WauSketch(spark: SparkSession, dir: String): DataFrame = {
    val daily = Q.t(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      // the only raw pass. lgK=21 (the max): the sketch stays in its
      // COUPON (exact) regime through the gated scales — the default
      // lgK=12 crossed into estimation at sf0.1 (527 vs the exact
      // 526) and broke the exact-count oracle. Measured boundary:
      // exact at sf0.01/sf0.1, ±1 departures from ~14k distincts
      // (sf1). The oracle certifies the merge ALGEBRA while exactness
      // holds; past it the estimate departs by design (the sketch IS
      // the point) and ApproxDistinctSpec's error bound vs the exact
      // fn6 is the contract.
      .agg(expr("hll_sketch_agg(user_id, 21)").as("sk"))
    val grid = daily.select(col("event_type"), col("day").as("report_day"))
    grid.join(daily,
        grid("event_type") === daily("event_type") &&
          col("day").between(date_sub(col("report_day"), 6), col("report_day")))
      .groupBy(grid("event_type").as("event_type"), col("report_day").as("day"))
      .agg(expr("cast(hll_sketch_estimate(hll_union_agg(sk)) as long)")
        .as("wau_approx"))
      .orderBy(col("event_type").asc, col("day").asc)
  }

  /** G1-exact: PageRank over the co-purchase graph in integer
    * parts-per-billion ([[graft.functions.GraphOps.pageRankPpb]]) —
    * the oracle-able variant of the float engine: every step is
    * BIGINT floor arithmetic, so the DuckDB oracle replays the
    * identical recurrence as five unrolled CTE stages and matches
    * hash-exactly. Edges: parts co-ordered in ≥2 distinct orders
    * (both orientations, so the graph is undirected and dangling-free
    * by construction). Scale shape: the pair build is fn3's bounded
    * self-join; each rank round is one equi-join + one keyed sum.
    */
  def g1PageRankExact(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraphOps
    val items = Q.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("s"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("d")),
        Seq("l_orderkey"))
      .filter(col("s") < col("d"))
      .groupBy(col("s"), col("d"))
      .agg(count(lit(1)).as("pn"))
      .filter(col("pn") >= 2)
      .select("s", "d")
    val edges = pairs.unionByName(
      pairs.select(col("d").as("s"), col("s").as("d")))
    GraphOps.pageRankPpb(edges, "s", "d", iters = 5)
      .orderBy(col("node").asc)
  }

  val g1Oracle: String = {
    def step(i: Int) =
      s"""r$i AS (
         |  SELECT nd.node,
         |    CAST(bs.base + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT)
         |      AS rank_ppb
         |  FROM nodes nd CROSS JOIN bs
         |  LEFT JOIN (
         |    SELECT e.d AS node, SUM(p.rank_ppb // dg.deg) AS s
         |    FROM r${i - 1} p JOIN deg dg ON p.node = dg.node
         |    JOIN edges e ON e.s = p.node
         |    GROUP BY 1) m ON nd.node = m.node)""".stripMargin
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS s, b.l_partkey AS d
       |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |edges AS (SELECT s, d FROM pairs
       |          UNION ALL SELECT d AS s, s AS d FROM pairs),
       |nodes AS (SELECT DISTINCT s AS node FROM edges),
       |deg AS (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
       |bs AS (SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS r0,
       |              CAST(150000000 // COUNT(*) AS BIGINT) AS base
       |       FROM nodes),
       |r0 AS (SELECT node, r0 AS rank_ppb FROM nodes CROSS JOIN bs),
       |${(1 to 5).map(step).mkString(",\n")}
       |SELECT node, rank_ppb FROM r5
       |ORDER BY node ASC NULLS FIRST""".stripMargin
  }

  /** G2: BFS hop levels — shortest hop distance (≤ 4) from a
    * deterministic source over the undirected customer↔part bipartite
    * graph (an edge = the customer ordered the part): the
    * "collaborative-filtering reach" traversal, and the graph family's
    * missing primitive next to PageRank (g1), triangles (d9) and
    * connected components (d6/mix11). Pregel-lite shape: each round is
    * ONE frontier⋈edges equi-join + distinct + anti-join against the
    * visited set — no all-pairs, no whole-graph collection; rounds are
    * O(diameter) and each round's state is localCheckpointed so the
    * lineage never compounds (the iterative-algorithm discipline g1's
    * float engine and sub5 already follow). Part nodes are shifted
    * +1e9 to keep the two key spaces disjoint. Hop distances are
    * integers, so the DuckDB recursive-CTE oracle matches hash-exact.
    */
  def g2BfsLevels(spark: SparkSession, dir: String): DataFrame = {
    val maxHops = 4
    val items = Q.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val co = Q.t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_partkey") + lit(1000000000L)).as("part"))
      .distinct()
    // both orientations; materialized ONCE — every round re-joins it
    val und = co.select(col("cust").as("node"), col("part").as("dst"))
      .unionByName(co.select(col("part").as("node"), col("cust").as("dst")))
      .localCheckpoint()
    // deterministic source: the smallest node id in the graph (a
    // customer — custkeys sit below the +1e9 part shift). One-row
    // aggregate frame, never collected to the driver.
    val seed = und.agg(min(col("node")).as("node"))
    var visited = seed.withColumn("dist", lit(0)).localCheckpoint()
    var frontier = visited.select("node")
    for (d <- 1 to maxHops) {
      val next = frontier.join(und, Seq("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .localCheckpoint()
      visited = visited.unionByName(next).localCheckpoint()
      frontier = next.select("node")
    }
    visited.orderBy(col("node").asc)
  }

  /** BFS truth from first principles: the recursive closure holds
    * every (node, depth ≤ 4) pair reachable by SOME path (UNION keeps
    * the state bounded at nodes × 5); MIN(depth) per node is the hop
    * distance — exactly the first-visit level the frontier loop
    * assigns.
    */
  val g2Oracle: String =
    """WITH RECURSIVE co AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_partkey + 1000000000 AS part
      |  FROM orders o JOIN (SELECT DISTINCT l_orderkey, l_partkey
      |                      FROM lineitem) l
      |    ON o.o_orderkey = l.l_orderkey),
      |und AS (SELECT cust AS node, part AS dst FROM co
      |        UNION ALL SELECT part, cust FROM co),
      |seed AS (SELECT MIN(node) AS node FROM und),
      |reach(node, d) AS (
      |  SELECT node, 0 FROM seed
      |  UNION
      |  SELECT u.dst, r.d + 1
      |  FROM reach r JOIN und u ON u.node = r.node
      |  WHERE r.d < 4)
      |SELECT node, MIN(d) AS dist
      |FROM reach
      |GROUP BY node
      |ORDER BY node ASC NULLS FIRST""".stripMargin

  /** G3: single-source WEIGHTED shortest paths — 4 Bellman-Ford
    * relaxation rounds over the co-purchase graph (g1's edge build),
    * edge weight = 100 div co-order-count + 1 (more co-orders ⟹
    * closer), source = the smallest node. The min-plus counterpart to
    * g2's hop-count BFS: distances compose by ADDITION and a longer
    * path can win on weight, so the frontier trick doesn't apply —
    * each round re-relaxes every labeled node (dist ∪ relaxed →
    * min per node), the textbook distributed Bellman-Ford. All-BIGINT
    * arithmetic ⟹ the DuckDB oracle unrolls the identical recurrence
    * as four CTE stages and matches hash-exact (the g1 discipline).
    * Bounded rounds are the documented semantic (4-hop-relaxed
    * distances), exactly what the oracle replays. Scale: each round is
    * one equi-join + one keyed min — no all-pairs, no driver state;
    * localCheckpoint per round keeps lineage flat.
    */
  def g3Sssp(spark: SparkSession, dir: String): DataFrame = {
    val items = Q.t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = items.select(col("l_orderkey"), col("l_partkey").as("s"))
      .join(items.select(col("l_orderkey"), col("l_partkey").as("d")),
        Seq("l_orderkey"))
      .filter(col("s") < col("d"))
      .groupBy(col("s"), col("d"))
      .agg(count(lit(1)).as("pn"))
      .filter(col("pn") >= 2)
      .withColumn("w", expr("CAST(100 DIV pn AS BIGINT) + 1"))
      .select("s", "d", "w")
    val edges = pairs.unionByName(
        pairs.select(col("d").as("s"), col("s").as("d"), col("w")))
      .localCheckpoint()
    var dist = edges.agg(min(col("s")).as("node"))
      .withColumn("dist", lit(0L))
      .localCheckpoint()
    for (_ <- 1 to 4) {
      val relaxed = dist.join(edges, dist("node") === edges("s"))
        .select(edges("d").as("node"), (dist("dist") + edges("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist.orderBy(col("node").asc)
  }

  val g3Oracle: String = {
    def stage(i: Int) =
      s"""d$i AS (
         |  SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.d, p.dist + e.w
         |    FROM d${i - 1} p JOIN edges e ON e.s = p.node)
         |  GROUP BY node)""".stripMargin
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT a.l_partkey AS s, b.l_partkey AS d,
       |    CAST(100 // COUNT(*) AS BIGINT) + 1 AS w
       |  FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
       |  WHERE a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |edges AS (SELECT s, d, w FROM pairs
       |          UNION ALL SELECT d AS s, s AS d, w FROM pairs),
       |d0 AS (SELECT MIN(s) AS node, CAST(0 AS BIGINT) AS dist FROM edges),
       |${(1 to 4).map(stage).mkString(",\n")}
       |SELECT node, dist FROM d4
       |ORDER BY node ASC NULLS FIRST""".stripMargin
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g1_pagerank_exact" -> g1PageRankExact,
    "g2_bfs_levels" -> g2BfsLevels,
    "g3_sssp" -> g3Sssp,
    "pr2_skew_report" -> pr2SkewReport,
    "pr3_eqdepth" -> pr3EqdepthHist,
    "fn5_pattern" -> fn5Pattern,
    "fn6_wau" -> fn6Wau,
    "fn7_wau_sketch" -> fn7WauSketch,
    "fn4_sessionize" -> fn4Sessionize,
    "fn1_funnel" -> fn1Funnel,
    "fn2_cohorts" -> fn2Cohorts,
    "fn3_copurchase" -> ((s, d) => fn3CoPurchase(s, d)),
    "pr1_profile" -> pr1Profile)

  val fn7Oracle: String =
    """WITH daily AS (
      |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id
      |  FROM events),
      |grid AS (SELECT DISTINCT event_type, day AS report_day FROM daily)
      |SELECT g.event_type, g.report_day AS day,
      |  COUNT(DISTINCT d.user_id) AS wau_approx
      |FROM grid g JOIN daily d
      |  ON g.event_type = d.event_type
      | AND d.day BETWEEN g.report_day - INTERVAL 6 DAY AND g.report_day
      |GROUP BY 1, 2
      |ORDER BY 1 ASC NULLS FIRST, 2 ASC NULLS FIRST""".stripMargin

  override def oracles: Map[String, String] = Map(
    "g1_pagerank_exact" -> g1Oracle,
    "g2_bfs_levels" -> g2Oracle,
    "g3_sssp" -> g3Oracle,
    "fn7_wau_sketch" -> fn7Oracle,
    "pr3_eqdepth" -> pr3Oracle,
    "fn5_pattern" -> fn5Oracle,
    "fn6_wau" -> fn6Oracle,
    "fn4_sessionize" -> fn4Oracle,
    "fn1_funnel" -> fn1Oracle,
    "fn2_cohorts" -> fn2Oracle,
    "fn3_copurchase" -> fn3Oracle,
    "pr1_profile" -> pr1Oracle,
    "pr2_skew_report" -> pr2Oracle)
}
