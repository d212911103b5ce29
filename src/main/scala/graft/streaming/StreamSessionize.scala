package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming sessionization via mapGroupsWithState — the custom-
 * state shape Structured Streaming offers beyond windowed aggregation
 * (KeyValueGroupedDataset): per-user session counting with a gap rule,
 * state = (last event second, sessions so far), carried across
 * micro-batches. The batch analog is `q_sessionize` (lag window); this
 * produces the same counts incrementally on an unbounded stream.
 *
 * State is per-key and tiny (two longs), so 10⁹ users is ~16 GB across
 * the cluster's state stores — bounded, checkpointed, recoverable.
 */
object StreamSessionize {

  /** (lastSec, sessions) carried per user across micro-batches. */
  case class SessionState(lastSec: Long, sessions: Long)
  case class SessionCount(user_id: Long, sessions: Long)

  /**
   * events: (userId, epochSecond). Use with OutputMode.Update. Within a
   * micro-batch events are sorted by time; across batches arrival order
   * is assumed (pair with a watermark upstream for true event-time
   * ordering guarantees).
   */
  def sessionize(events: Dataset[(Long, Long)], gapSecs: Long): Dataset[SessionCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[SessionState, SessionCount](
        GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[SessionState]) =>
          val secs = it.map(_._2).toSeq.sorted
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
          secs.foreach { s =>
            if (st.lastSec == Long.MinValue || s - st.lastSec > gapSecs)
              st = SessionState(s, st.sessions + 1)
            else st = SessionState(s, st.sessions)
          }
          state.update(st)
          SessionCount(user, st.sessions)
      }
  }

  /** The OutputMode this operator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
