package graft.queries

import graft.{Q, QueryModule}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-equivalent forms of the streaming window operators (T2/T3,
  * SURVEY.md §2.10) — same `window`/`session_window` expressions the
  * streams use, run over the events table so the DuckDB oracle can
  * check them (stream≡batch equality itself is StreamingSpec's job).
  */
object StreamingQueries extends QueryModule {

  /** T2 batch form: 1-hour tumbling windows over events. */
  def t2Tumbling(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("n"), col("value_sum"))
      .orderBy(col("window_start").asc)

  val t2Oracle: String =
    s"""SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       |  COUNT(*) AS n, ${Q.sql.dsum("value")} AS value_sum
       |FROM events
       |GROUP BY 1
       |ORDER BY window_start ASC NULLS FIRST""".stripMargin

  /** T3a batch form: 1-hour windows sliding every 30 minutes — every
    * event lands in exactly two windows.
    */
  def t3Sliding(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n"))
      .orderBy(col("window_start").asc)

  val t3SlidingOracle: String =
    """WITH starts AS (
      |  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
      |           - i * 1800000000) AS window_start
      |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i))
      |SELECT window_start,
      |  window_start + INTERVAL 1 HOUR AS window_end,
      |  COUNT(*) AS n
      |FROM starts
      |GROUP BY 1
      |ORDER BY window_start ASC NULLS FIRST""".stripMargin

  /** T3b batch form: 30-minute-gap sessions per user. Oracle is the
    * classic gaps-and-islands rewrite.
    */
  def t3Session(spark: SparkSession, dir: String): DataFrame =
    Q.t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"))
      .orderBy(col("user_id").asc, col("session_start").asc)

  val t3SessionOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
      |           OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id ASC NULLS FIRST, session_start ASC NULLS FIRST""".stripMargin

  /** T12b: events streamed through the graft-table SINK with
    * Trigger.AvailableNow, drained TWICE from one checkpoint (the
    * second drain must add nothing — exactly-once across a restart),
    * then the governed table is read back and aggregated. The oracle
    * replays the aggregate over the raw events: equality proves full
    * row fidelity through the sink's batch-rewrap path AND that the
    * replayed drain was a no-op. Scale: one governed append of the
    * streamed rows; the second drain costs one manifest listing.
    */
  def t12SinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${sys.props("java.io.tmpdir")}/graft_stream_t12_${ProcessHandle.current().pid()}"
    val fsPath = new org.apache.hadoop.fs.Path(scratch)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(fsPath, true)
    val root = s"$scratch/sink_table"
    val src = s"$dir/events.parquet"
    // the file stream source lists a DIRECTORY; the testdata table is a
    // single file — stage a copy into a scratch inbox (raw byte copy)
    val inbox = new org.apache.hadoop.fs.Path(s"$scratch/inbox")
    fs.mkdirs(inbox)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(inbox, "events.parquet"),
      false, spark.sessionState.newHadoopConf())
    val schema = spark.read.parquet(src).schema
    def drain(): Unit = spark.readStream.schema(schema)
      .parquet(inbox.toString)
      .writeStream
      .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
      .option("root", root)
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    drain()
    drain() // restart from the same checkpoint: must be a no-op
    graft.lake.ManifestTable.forRoot(spark, root).read()
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("value_sum"))
      .orderBy(col("event_type").asc)
  }

  val t12Oracle: String =
    s"""SELECT event_type, COUNT(*) AS n, ${Q.sql.dsum("value")} AS value_sum
       |FROM events
       |GROUP BY 1
       |ORDER BY event_type ASC NULLS FIRST""".stripMargin

  /** T13: the change-data-feed STREAM — orders landed as a governed
    * table (v0), hit with a keyed MERGE (updates + inserts, v1) and a
    * DV DELETE (v2), then drained through
    * `readStream.option("readChangeFeed", true)` from a fresh
    * checkpoint: one AvailableNow batch unions the three versions'
    * keyed diffs (`_change_type`, `_commit_version`). The oracle
    * reconstructs the exact change history from the raw orders table —
    * equality proves the per-commit O(changed-files) diff, the
    * insert/update/delete typing, and that non-append commits flow as
    * data instead of killing the stream. Scale: each version's diff
    * touches only that commit's changed files; a catch-up drain costs
    * the backlog's delta, never a snapshot pair per version.
    */
  def t13CdfStream(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${sys.props("java.io.tmpdir")}/graft_stream_t13_${ProcessHandle.current().pid()}"
    val fsPath = new org.apache.hadoop.fs.Path(scratch)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(fsPath, true)
    val root = s"$scratch/cdf_table"
    val orders = Q.t(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    val mt = new graft.lake.ManifestTable(spark, root)
    mt.write(orders, "overwrite") // v0
    val updates = orders.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(orders.filter(col("o_orderkey") % 503 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    mt.merge(updates, Seq("o_orderkey")) // v1
    mt.delete(col("o_orderkey") % 15 === 0) // v2 (DV marks)
    spark.readStream
      .format(classOf[graft.streaming.GraftTableSourceProvider].getName)
      .option("root", root)
      .option("readChangeFeed", "true")
      .option("keys", "o_orderkey")
      .load()
      .writeStream
      .format("parquet")
      .option("path", s"$scratch/out")
      .option("checkpointLocation", s"$scratch/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    spark.read.parquet(s"$scratch/out")
      // _commit_timestamp flows too but is wall-clock — project the
      // deterministic columns for the oracle (its history() equality
      // lives in StreamingSpec)
      .select("o_orderkey", "o_totalprice", "_change_type",
        "_commit_version")
      .orderBy(col("o_orderkey").asc, col("_commit_version").asc,
        col("_change_type").asc)
  }

  /** The change history t13 must stream: v0 = every row as insert; v1
    * = the merge's update pairs (%97 keys) and fresh inserts (%503
    * keys shifted +10M); v2 = deletes of the keys %15 == 0 AT THE v1
    * STATE — original keys carry their possibly-updated price, and a
    * shifted insert dies when (k+10000000) % 15 = 0, i.e. k % 15 = 5.
    */
  val t13Oracle: String =
    """SELECT o_orderkey, o_totalprice, _change_type, _commit_version FROM (
      |  SELECT o_orderkey, o_totalprice, 'insert' AS _change_type,
      |         CAST(0 AS BIGINT) AS _commit_version
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice, 'update_preimage', 1
      |  FROM orders WHERE o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_totalprice + 1000.0, 'update_postimage', 1
      |  FROM orders WHERE o_orderkey % 97 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice, 'insert', 1
      |  FROM orders WHERE o_orderkey % 503 = 0
      |  UNION ALL
      |  SELECT o_orderkey,
      |         CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
      |              ELSE o_totalprice END, 'delete', 2
      |  FROM orders WHERE o_orderkey % 15 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice, 'delete', 2
      |  FROM orders WHERE o_orderkey % 503 = 0 AND o_orderkey % 15 = 5)
      |ORDER BY o_orderkey ASC NULLS FIRST, _commit_version ASC NULLS FIRST,
      |  _change_type ASC NULLS FIRST""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t2_tumbling_window" -> t2Tumbling,
    "t3_sliding_window" -> t3Sliding,
    "t3_session_window" -> t3Session,
    "t12_sink_roundtrip" -> t12SinkRoundtrip,
    "t13_cdf_stream" -> t13CdfStream)

  override def oracles: Map[String, String] = Map(
    "t2_tumbling_window" -> t2Oracle,
    "t3_sliding_window" -> t3SlidingOracle,
    "t3_session_window" -> t3SessionOracle,
    "t12_sink_roundtrip" -> t12Oracle,
    "t13_cdf_stream" -> t13Oracle)
}
