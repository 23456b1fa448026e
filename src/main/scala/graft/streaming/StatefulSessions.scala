package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: gap-based session tracking per user via
  * flatMapGroupsWithState — the streaming twin of AdvancedQ.q29. A session
  * closes when no event arrives within `gapSeconds` (processing-time
  * timeout); the closed session is emitted exactly once. State per key is
  * O(1) (count/sum/bounds), so state size scales with live users, not
  * event volume. */
object StatefulSessions {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long,
      sum: Double)
  final case class ClosedSession(user_id: Long, start_ts: Long,
      end_ts: Long, n_events: Long, sum_value: Double)

  /** `timeout = ProcessingTimeTimeout` closes idle sessions between
    * batches in a deployment; tests pass `NoTimeout` and drive closure
    * through data gaps (stateful queries under a processing-time trigger
    * rerun timeout-check batches continuously). */
  def track(events: Dataset[Ev], gapSeconds: Long = 1800,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout)
      : Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, timeout) {
        (user, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000 =>
                  cur = Some(s.copy(last = t, n = s.n + 1,
                    sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= ClosedSession(user, s.start, s.last, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
