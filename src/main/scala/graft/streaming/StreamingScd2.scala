package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 — CDC interval construction ONLINE: collapse each
  * user's event stream into state runs and emit a validity interval the
  * moment a run CLOSES (the next state change arrives and clears the
  * watermark). The streaming twin of `ev_scd2`'s batch lineage
  * (queries.Events.scd2Intervals); StreamingScd2Spec asserts the
  * streamed closed intervals ≡ the batch table's `is_current = false`
  * rows.
  *
  * Run construction is ORDER-SENSITIVE (unlike sessionization's
  * commutative merge), so events cannot fold into the run state on
  * arrival: a within-watermark straggler older than an already-folded
  * event would corrupt the run sequence. Instead the state buffers
  * events still inside the watermark and folds ONLY the released prefix
  * (event time ≤ current watermark — nothing older can still arrive) in
  * (ems, event_id) order, exactly the batch sort key. State per key is
  * the open run plus the in-watermark buffer — bounded by the watermark
  * delay, not the stream length; the event-time timeout re-releases the
  * buffer when the watermark advances without new events for the user.
  */
object StreamingScd2 {

  case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String)

  /** The open run (exactly ev_scd2's in-progress interval). */
  case class Open(state: String, validFrom: Long, n: Long)

  /** Per-user state: watermark-buffered events + the open run. */
  case class St(buf: List[(Long, Long, String)], open: Option[Open])

  /** One CLOSED interval (the batch table's is_current=false shape). */
  case class IntervalOut(user_id: Long, state: String, valid_from: Long,
      valid_to: Long, n_events: Long)

  private def step(userId: Long, rows: Iterator[Ev],
      state: GroupState[St]): Iterator[IntervalOut] = {
    val st0 = state.getOption.getOrElse(St(Nil, None))
    val buf = st0.buf ++
      rows.map(e => (e.ts.getTime, e.event_id, e.event_type))
    val wm = state.getCurrentWatermarkMs()
    val (ready, pending) = buf.partition(_._1 <= wm)
    var open = st0.open
    val out = List.newBuilder[IntervalOut]
    ready.sortBy(t => (t._1, t._2)).foreach { case (ems, _, typ) =>
      open match {
        case Some(o) if o.state == typ => open = Some(o.copy(n = o.n + 1))
        case Some(o) =>
          out += IntervalOut(userId, o.state, o.validFrom, ems, o.n)
          open = Some(Open(typ, ems, 1L))
        case None => open = Some(Open(typ, ems, 1L))
      }
    }
    if (pending.isEmpty && open.isEmpty) state.remove()
    else {
      state.update(St(pending, open))
      // re-arm: fold the buffer when the watermark clears its oldest
      // event even if the user never sends another one
      if (pending.nonEmpty) state.setTimeoutTimestamp(pending.map(_._1).min)
    }
    out.result().iterator
  }

  /** `events` must be a STREAMING DataFrame with (user_id LONG,
    * ts TIMESTAMP, event_id LONG, event_type STRING). Emits one row per
    * CLOSED interval; the open run per user stays in state (it is the
    * batch table's `is_current` row, unemittable until it closes).
    */
  def apply(events: DataFrame,
      watermarkDelay: String = "0 seconds"): Dataset[IntervalOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(step)
  }
}
