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
}
