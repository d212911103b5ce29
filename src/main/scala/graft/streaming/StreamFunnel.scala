package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Stateful streaming funnel via mapGroupsWithState — a multi-stage
 * STATE MACHINE per key, the pattern beyond [[StreamSessionize]]'s
 * single gap rule: each user's state is the (t1, t2, t3) stage-time
 * triple of the earliest ordered view → click → purchase chain, advanced
 * greedily as events arrive in time order. Greedy-in-time-order equals
 * the batch semantics (q_funnel: t1 = min view, t2 = min click > t1,
 * t3 = min purchase > t2) because each stage takes the FIRST qualifying
 * event; within a micro-batch events sort by time, across batches
 * arrival order is assumed (the [[StreamSessionize]] contract — the
 * events feed is time-ordered).
 *
 * State is three longs per user — 10⁹ users ≈ 24 GB across the state
 * stores, bounded and checkpointable. Update mode emits the advancing
 * state; stages only ever transition unset (-1) → set, so the drained
 * table's per-user max of each stage time IS the final state.
 */
object StreamFunnel {

  /** Stage times; -1 = stage not reached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  case class FunnelUpdate(user_id: Long, t1: Long, t2: Long, t3: Long)

  /** events: (userId, epochMicros, eventType). Use with Update mode. */
  def funnel(events: Dataset[(Long, Long, String)]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          // tie order (tu, type): a click at exactly the first view's
          // time processes before it and is skipped — matching the
          // batch side's strict t > t1
          it.toSeq.sortBy(e => (e._2, e._3)).foreach { case (_, tu, tpe) =>
            if (tpe == "view" && st.t1 < 0)
              st = st.copy(t1 = tu)
            else if (tpe == "click" && st.t1 >= 0 && tu > st.t1 && st.t2 < 0)
              st = st.copy(t2 = tu)
            else if (tpe == "purchase" && st.t2 >= 0 && tu > st.t2 && st.t3 < 0)
              st = st.copy(t3 = tu)
          }
          state.update(st)
          FunnelUpdate(user, st.t1, st.t2, st.t3)
      }
  }

  /** The OutputMode this operator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
