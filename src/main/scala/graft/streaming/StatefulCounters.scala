package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Spark 4 `transformWithState` — the arbitrary-state operator API that
  * supersedes flatMapGroupsWithState (typed composite state with
  * per-state TTL, timers, and the state data source for inspection;
  * requires the RocksDB state store provider). The engine keeps
  * [[StatefulSessionize]] on the older API deliberately — both APIs are
  * part of the supported surface — and uses the new one here for its
  * natural fit: long-lived per-entity composite state.
  *
  * Operator: per-user typed event counters in a MapState[event_type ->
  * count], emitting the updated (user, type, running count) rows each
  * micro-batch — the streaming twin of `groupBy(user, type).count`.
  * State size is O(users x distinct types), independent of event
  * volume; a TTL config would bound it further for abandoned users
  * (RocksDB evicts without any per-key polling).
  */
object StatefulCounters {

  final case class Ev(user_id: Long, event_type: String, event_id: Long)
  final case class TypedCount(user_id: Long, event_type: String, n: Long)

  class CounterProcessor extends StatefulProcessor[Long, Ev, TypedCount] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[TypedCount] = {
      // fold the batch locally, ONE state read + write per touched type
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { e =>
        val base = touched.getOrElse(e.event_type,
          if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L)
        touched(e.event_type) = base + 1L
      }
      touched.foreach { case (t, n) => counts.updateValue(t, n) }
      touched.iterator.map { case (t, n) => TypedCount(user, t, n) }
    }
  }

  /** Running per-(user, event_type) counts over a stream of events. */
  def typedCounts(events: Dataset[Ev]): Dataset[TypedCount] = {
    implicit val outEnc = Encoders.product[TypedCount]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new CounterProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class EvT(user_id: Long, event_type: String, ts: java.sql.Timestamp)

  /** The event-time-timer path of the API: counters accumulate silently
    * and are emitted ONCE, as final totals, when the watermark proves the
    * user idle past `idleGapMs` — the "closed ledger per entity" shape
    * (per-user ingest totals, billing periods, abandoned-cart rollups).
    * One registered timer per key, re-armed on every batch; expiry emits
    * and clears, so state for quiet users reaches exactly zero without
    * any scan-all-keys sweep. */
  class FinalizingCounterProcessor(idleGapMs: Long)
      extends StatefulProcessor[Long, EvT, TypedCount] {
    @transient private var counts: MapState[String, Long] = _
    @transient private var deadline: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long](
        "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      deadline = getHandle.getValueState[Long](
        "deadline", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        user: Long, rows: Iterator[EvT], tv: TimerValues): Iterator[TypedCount] = {
      var maxTs = Long.MinValue
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type)) counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1L)
        maxTs = math.max(maxTs, e.ts.getTime)
      }
      // re-arm the single idle timer: drop the previous deadline, register
      // the new one (event-time timers fire when the watermark passes them)
      val next = maxTs + idleGapMs
      if (deadline.exists() && deadline.get() != next) getHandle.deleteTimer(deadline.get())
      deadline.update(next)
      getHandle.registerTimer(next)
      Iterator.empty
    }

    override def handleExpiredTimer(
        user: Long, tv: TimerValues, expired: ExpiredTimerInfo): Iterator[TypedCount] = {
      val out = counts.iterator().map { case (t, n) => TypedCount(user, t, n) }.toVector
      counts.clear()
      deadline.clear()
      out.iterator
    }
  }

  /** Final per-(user, event_type) totals, emitted when the user has been
    * idle past `idleGapMinutes` by event time. */
  def finalizedCounts(events: Dataset[EvT], idleGapMinutes: Int): Dataset[TypedCount] = {
    implicit val outEnc = Encoders.product[TypedCount]
    events.withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new FinalizingCounterProcessor(idleGapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  final case class Recent(user_id: Long, n_buffered: Int, oldest_id: Long, newest_id: Long)

  /** The THIRD state type of the API, ListState: a bounded last-N ring
    * buffer per entity (the "recent context" a personalization or
    * fraud-scoring pipeline keeps). State is O(users x n) regardless of
    * event volume — the buffer is re-put trimmed every batch, so RocksDB
    * never accumulates history. Incoming rows are folded in event_id
    * order so the buffer content is input-partitioning-independent. */
  class RecentEventsProcessor(n: Int) extends StatefulProcessor[Long, Ev, Recent] {
    @transient private var recent: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      recent = getHandle.getListState[Long]("recent", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev], tv: TimerValues): Iterator[Recent] = {
      val incoming = rows.map(_.event_id).toArray.sorted
      val merged = (recent.get().toArray ++ incoming).takeRight(n)
      recent.put(merged)
      Iterator.single(Recent(user, merged.length, merged.head, merged.last))
    }
  }

  /** Last-`n` event ids per user as a streaming ring buffer. */
  def recentEvents(events: Dataset[Ev], n: Int): Dataset[Recent] = {
    implicit val outEnc = Encoders.product[Recent]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RecentEventsProcessor(n), TimeMode.None(), OutputMode.Update())
  }
}
