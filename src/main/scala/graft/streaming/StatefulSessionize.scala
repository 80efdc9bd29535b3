package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator: gap-based sessionization with
  * flatMapGroupsWithState — the arbitrary-state path for semantics that
  * windowed aggregation can't express (a session has no fixed window; it
  * closes only when the user goes quiet).
  *
  * State per user = the one open session; event-time timeout set to
  * lastSeen + gap, so the watermark closes idle sessions without any
  * per-user polling. State size is O(active users), not O(events) —
  * bounded at any scale. The batch twin is EventQueries.e02 (lag ->
  * boundary -> running sum); StreamingSpec proves the streamed session
  * counts equal the batch ones, including across a checkpoint restart.
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class OpenSession(startUs: Long, lastUs: Long, n: Int)
  final case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, n_events: Int)

  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[ClosedSession] = {
    val gapUs = gapMinutes * 60L * 1000000L
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[ClosedSession]
    import events.sparkSession.implicits._

    events
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[OpenSession]) =>
          def us(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          if (state.hasTimedOut) {
            // watermark passed lastSeen+gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(userId, s.startUs, s.lastUs, s.n))
          } else {
            // per-user per-batch events are small; sort locally by time
            val sorted = batch.toArray.sortBy(e => (us(e.ts), e.event_id))
            var open = state.getOption
            val closed = Vector.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = us(e.ts)
              open match {
                case Some(s) if t - s.lastUs > gapUs =>
                  closed += ClosedSession(userId, s.startUs, s.lastUs, s.n)
                  open = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  // a late (but above-watermark) event may precede the open
                  // session's start — extend the session backwards too
                  open = Some(s.copy(startUs = math.min(s.startUs, t),
                    lastUs = math.max(s.lastUs, t), n = s.n + 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open match {
              case Some(s) =>
                val wmUs = state.getCurrentWatermarkMs() * 1000L
                if (s.lastUs + gapUs <= wmUs) {
                  // already expired relative to the watermark: close now
                  closed += ClosedSession(userId, s.startUs, s.lastUs, s.n)
                  state.remove()
                } else {
                  state.update(s)
                  state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L + 1)
                }
              case None => state.remove()
            }
            closed.result().iterator
          }
      }
  }
}
