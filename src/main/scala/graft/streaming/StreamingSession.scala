package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` member of the engine's streaming surface
  * (alongside windowed aggregation, StreamingCrop, and watermark dedup,
  * StreamingDedup). Batch equivalent: the `ev_sessionize` lineage; the
  * spec asserts batch ≡ streaming on the events fixture.
  *
  * Semantics match the batch form exactly: a gap of MORE than `gapMs`
  * between consecutive events splits a session (`> gap` splits, `== gap`
  * merges — same rule the `session_window` built-in applies). A session
  * is emitted exactly once, when the event-time watermark passes its
  * close (last event + gap): no earlier (late events within the
  * watermark may still extend it) and no later (the group's event-time
  * timeout fires even if the user never sends another event).
  *
  * State per key is the OPEN sessions only — closed sessions leave state
  * immediately, so state size is O(users), not O(events): the
  * bounded-state contract that survives an unbounded stream.
  */
object StreamingSession {

  /** One input event (value carried as exact cents). The event-time
    * column rides along as a Timestamp: the watermark tag lives on that
    * attribute, and the stateful operator requires it in its input.
    */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, cents: Long) {
    def ems: Long = ts.getTime
  }

  /** An open or closed session's aggregates. */
  case class Sess(start: Long, end: Long, n: Long, cents: Long)

  /** One finalized session. */
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** Fold time-sorted items into gap-separated sessions. */
  private[streaming] def merge(items: Seq[Sess], gapMs: Long): List[Sess] =
    items.sortBy(s => (s.start, s.end)).foldLeft(List.empty[Sess]) {
      case (acc, s) => acc match {
        case head :: tail if s.start - head.end <= gapMs =>
          Sess(head.start, math.max(head.end, s.end),
            head.n + s.n, head.cents + s.cents) :: tail
        case _ => s :: acc
      }
    }.reverse

  private def step(gapMs: Long)(userId: Long, rows: Iterator[Ev],
      state: GroupState[List[Sess]]): Iterator[SessionOut] = {
    val prior = state.getOption.getOrElse(Nil)
    val incoming = rows.map(e => Sess(e.ems, e.ems, 1L, e.cents)).toSeq
    val sessions = merge(prior ++ incoming, gapMs)
    val wm = state.getCurrentWatermarkMs()
    val (closed, open) = sessions.partition(_.end + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(open)
      // wake up when the earliest open session is closable even if the
      // user never sends another event
      state.setTimeoutTimestamp(open.map(_.end + gapMs).min)
    }
    closed.iterator.map(s =>
      SessionOut(userId, s.start, s.end, s.n, s.cents / 100.0))
  }

  /** `events` must be a STREAMING DataFrame with (user_id LONG,
    * ts TIMESTAMP, value DOUBLE). Emits one row per closed session.
    */
  def apply(events: DataFrame, gapMs: Long = 1800000L,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step(gapMs))
  }
}
