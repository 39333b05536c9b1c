package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.syntax._

/** One event row (the `events` table schema, ts at microsecond precision). */
final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                       event_type: String, value: Double)

/** Per-user session accumulator carried across micro-batches. */
final case class SessionState(lastMs: Long, nSessions: Long, nEvents: Long)

/** Streaming output row of [[Streams.sessionize]]. */
final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

/** Structured Streaming twins of the batch operators in
  * graft.operators.Events — same aggregation logic, driven by
  * `readStream` instead of `read`. The batch forms remain the
  * oracle-checkable semantics; these are the low-latency deployment path
  * (`events` as a Kafka/file stream at scale).
  *
  * State sizing at 100 TB: the hourly aggregate keeps (hours-in-watermark
  * x event_types) rows; sessionize keeps ONE small struct per active
  * user, hash-partitioned by user_id — both bounded, both laid out on the
  * same key the batch jobs shuffle on.
  */
object Streams {

  /** Tumbling-window twin of Events.hourlyAgg. The 2h watermark bounds
    * state and admits the usual late-data slack; output rows match the
    * batch query's (hour_ts, event_type, n, sum_value) schema. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
      .select(
        unix_timestamp($"window.start").as("hour_ts"),
        $"event_type", $"n", $"sum_value")

  /** Streaming twin of Events.topTypePerUser's underlying counts: the
    * per-(user, type) totals maintained incrementally (complete-mode
    * aggregate, state keyed exactly like the batch shuffle). The rank-1
    * cut stays a cheap batch query over this materialized view — ranking
    * inside the stream would force per-trigger re-sorts of all users. */
  def typeCounts(events: DataFrame): DataFrame =
    events.groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))

  /** Stateful sessionization twin of Events.sessionize (30-min inactivity
    * gap). flatMapGroupsWithState keeps one SessionState per user;
    * emits the running (n_sessions, n_events) per user each batch
    * (Update mode). Matches the batch result when events arrive in
    * event-time order across batches (an in-order source or an upstream
    * sort-within-watermark); out-of-order arrivals within one batch are
    * sorted before folding. */
  def sessionize(events: Dataset[Event], gapMs: Long = 1800000L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          for (e <- sorted) {
            val ms = e.ts.getTime
            val isNew = st.lastMs == Long.MinValue || ms - st.lastMs > gapMs
            st = SessionState(ms, st.nSessions + (if (isNew) 1L else 0L), st.nEvents + 1L)
          }
          state.update(st)
          Iterator(UserSessions(uid, st.nSessions, st.nEvents))
      }
  }
}
