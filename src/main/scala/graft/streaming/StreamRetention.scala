package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming cohort retention — q_retention's incremental twin, the last
 * batch-only analytics classic (reference: dragnet's per-day rollups,
 * bin/dn date breakdowns; the retention matrix is their product-
 * analytics composition). Per-user state is TWO scalars:
 *
 *   - `cohort`: the earliest day seen (may move EARLIER when a late
 *     batch delivers an older event);
 *   - `mask`: a 7-bit window of active days at offsets 0..6 from the
 *     cohort.
 *
 * The state is order-independent: when the cohort shifts down by δ,
 * every recorded offset grows by δ, which is exactly `mask << δ` with
 * bits past offset 6 dropping — a day that leaves the 7-day window
 * stays out no matter what arrives later, so ANY arrival order
 * converges to the batch answer (stronger than [[StreamFunnel]]'s
 * time-ordered-feed contract, and pinned by StreamRetentionSpec's
 * shuffled-replay test).
 *
 * Update mode emits the advancing state with a per-user update `seq`;
 * the drain takes each user's max-seq row (struct-max — seq strictly
 * increases), explodes the mask bits, and aggregates to the
 * (cohort, off) → active_users matrix. State is ~2 longs + an int per
 * user — 10⁹ users ≈ 20 GB across the state stores, bounded and
 * checkpointable; no per-day growth.
 */
object StreamRetention {

  /** Days tracked past the cohort day (offsets 0..Window-1). */
  val Window = 7

  case class RetState(cohort: Long, mask: Int, seq: Long)
  case class RetUpdate(user_id: Long, cohort: Long, mask: Int, seq: Long)

  /** events: (userId, epochDay). Use with Update mode. */
  def retention(events: Dataset[(Long, Long)]): Dataset[RetUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .mapGroupsWithState[RetState, RetUpdate](
        GroupStateTimeout.NoTimeout()) {
        case (user, it, state: GroupState[RetState]) =>
          var st = state.getOption.getOrElse(RetState(Long.MaxValue, 0, 0L))
          it.foreach { case (_, day) =>
            if (day < st.cohort) {
              val shift = math.min(st.cohort - day, Window.toLong).toInt
              val shifted =
                if (st.cohort == Long.MaxValue) 0
                else (st.mask << shift) & ((1 << Window) - 1)
              st = st.copy(cohort = day, mask = shifted | 1)
            } else if (day - st.cohort < Window)
              st = st.copy(mask = st.mask | (1 << (day - st.cohort).toInt))
          }
          st = st.copy(seq = st.seq + 1)
          state.update(st)
          RetUpdate(user, st.cohort, st.mask, st.seq)
      }
  }

  /** The OutputMode this operator requires. */
  val outputMode: OutputMode = OutputMode.Update()
}
