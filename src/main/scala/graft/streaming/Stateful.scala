package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over streams (SURVEY.md §2.10 / the
  * `flatMapGroupsWithState` surface): a running per-user activity
  * profile that emits an updated summary row per micro-batch.
  *
  * Scale notes: state is one small case class per user key, stored in
  * the state store (RocksDB/HDFS-backed in production), partitioned by
  * key hash — state size is O(distinct users), never O(events). A
  * processing-time timeout would evict idle users; kept off here for
  * deterministic tests.
  */
object Stateful {

  case class Event(user_id: Long, event_type: String, value: Double)
  case class UserProfile(user_id: Long, n_events: Long, n_purchases: Long,
      total_value: Double)

  def updateProfile(userId: Long, events: Iterator[Event],
      state: GroupState[UserProfile]): Iterator[UserProfile] = {
    val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0L, 0.0))
    var n = prev.n_events
    var p = prev.n_purchases
    var v = prev.total_value
    events.foreach { e =>
      n += 1
      if (e.event_type == "purchase") p += 1
      v += e.value
    }
    val next = UserProfile(userId, n, p, v)
    state.update(next)
    Iterator.single(next)
  }

  /** Streaming: one updated profile row per user per micro-batch. */
  def userProfiles(spark: SparkSession, events: Dataset[Event]): Dataset[UserProfile] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateProfile)
  }

  // ---- T8b: first-seen dedup with event-time TTL state eviction ----

  case class Keyed(key: String, ts: java.sql.Timestamp, value: Double)
  // public: Spark's state-store encoder codegen needs the accessor
  case class SeenState(firstTsMs: Long)

  /** First-seen dedup whose per-key state is EVICTED once the watermark
    * passes first-seen + TTL — the custom-state form of
    * `dropDuplicatesWithinWatermark`. The point at 100 TB: without a
    * timeout, dedup state grows O(all keys ever seen) and the job dies
    * slowly; with an event-time TTL it is O(keys active in the last TTL
    * window), independent of stream age. A key reappearing after
    * eviction re-emits (by design — that IS the TTL contract).
    */
  def dedupFirstSeenTtl(spark: SparkSession, events: Dataset[Keyed],
      watermarkDelay: String, ttlMs: Long): Dataset[Keyed] = {
    import spark.implicits._

    def update(key: String, it: Iterator[Keyed],
        state: GroupState[SeenState]): Iterator[Keyed] = {
      if (state.hasTimedOut) { // watermark passed firstSeen + TTL
        state.remove()
        Iterator.empty
      } else {
        val wm = state.getCurrentWatermarkMs()
        // Logically-expired state: new data for a key whose TTL the
        // watermark has already passed, arriving in the SAME batch that
        // would have fired its timeout (data beats timeout processing).
        // Without this, setTimeoutTimestamp(firstSeen + TTL) below would
        // be ≤ watermark — an IllegalArgumentException that kills the
        // query. Expired state starts a fresh first-seen epoch.
        if (state.exists && state.get.firstTsMs + ttlMs <= wm) state.remove()
        val rows = it.toList
        val out =
          if (state.exists) Iterator.empty // duplicate within TTL: suppress
          else {
            val first = rows.minBy(_.ts.getTime)
            state.update(SeenState(first.ts.getTime))
            Iterator.single(first)
          }
        // (re-)arm the eviction clock every invocation: EventTimeTimeout
        // fires when the watermark crosses firstSeen + TTL (clamped above
        // the watermark — required by the state API)
        state.setTimeoutTimestamp(math.max(state.get.firstTsMs + ttlMs, wm + 1))
        out
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ---- T12: streaming heavy hitters (sharded Misra-Gries state) ----

  /** Streaming top-item tracking: each shard keeps a bounded
    * Misra-Gries counter map (capacity k) in keyed state and re-emits
    * its current summary every micro-batch. Items are SHARDED BY ITEM
    * HASH, so each item's counts live in exactly one shard: the global
    * summary is the plain union of shard summaries (no cross-shard
    * merge), the n/(k+1) undercount bound holds per shard over that
    * shard's n, and state is O(shards · k) forever — the property that
    * lets a top-K dashboard run against an unbounded stream. Reuses
    * the BATCH aggregator's reduce step ([[Sketches.HeavyHittersAggregator]]),
    * so streaming and batch estimates can never diverge in logic.
    */
  def streamingTopK(spark: SparkSession, items: Dataset[String],
      k: Int, shards: Int = 8): Dataset[(Int, String, Long)] = {
    import spark.implicits._
    val agg = new graft.functions.Sketches.HeavyHittersAggregator(k)
    items.groupByKey(s => math.floorMod(if (s == null) 0 else s.hashCode, shards))
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, it: Iterator[String],
         state: GroupState[Map[String, Long]]) =>
          var b = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach(s => b = agg.reduce(b, s))
          state.update(b)
          agg.finish(b).iterator.map { case (item, c) => (shard, item, c) }
      }
  }
}
