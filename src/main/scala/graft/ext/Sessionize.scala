package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Arbitrary-stateful sessionization via `KeyValueGroupedDataset
 * .flatMapGroupsWithState` — the custom-state escape hatch the brief names
 * for semantics `session_window` cannot express. Here: sessions close on a
 * quiet gap OR when they reach an event-count cap (an "activity cap" has no
 * declarative window equivalent; it is inherently a running fold).
 *
 * The reference's DLT pipelines stay declarative, so this operator has no
 * reference twin; it fills the §2.5/§2.8 custom-state row. Semantics mirror
 * `session_window` where they overlap: a session admits an event while
 * `ts < last_ts + gap`, and the reported end is `last_ts + gap`.
 *
 * Scale: one shuffle on the grouping key; per-key work is a sort + linear
 * fold. Events are buffered per (key, invocation) — bounded by events per
 * user per batch, the same envelope any per-key sort assumes. Keys are
 * independent, so 1000 executors each fold their own key range; there is no
 * driver-side state. In batch mode Spark invokes the function once per key
 * with the key's full history and ignores timeouts, so the trailing open
 * session is flushed at end of input; [[sessionsStream]] is the streaming
 * deployment of the same fold — open sessions persist in [[GroupState]]
 * across micro-batches and flush on event-time timeout.
 */
object Sessionize extends Serializable {

  final case class Event(user_id: Long, ts: Timestamp, value: Double, event_id: Long)

  // event-time arithmetic runs in epoch MICROSECONDS: Timestamp.getTime is
  // millis and would silently truncate the micro-precision event times the
  // test tables (and most telemetry) carry
  private def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  /** The open (not-yet-closed) session of one key. */
  final case class OpenSession(
      startUs: Long, lastUs: Long, cnt: Long, maxValue: Double)

  /** Per-key fold state: sessions emitted so far + the open session. */
  final case class SessState(nextIdx: Long, open: Option[OpenSession])

  final case class Session(
      user_id: Long, session_idx: Long, s_start: Timestamp, s_end: Timestamp,
      cnt: Long, max_value: Double)

  /** Shared incremental fold: continue `st` over this invocation's events
   *  (sorted by (ts, event_id)), returning the advanced state and the
   *  sessions closed along the way. Package-visible so the property suite
   *  can pin chunked ≡ one-shot folding (the batch/stream equivalence). */
  private[ext] def foldEvents(uid: Long, st0: SessState, it: Iterator[Event],
      gapUs: Long, cap: Int): (SessState, Seq[Session]) = {
    val sorted = it.map(e => (toMicros(e.ts), e))
      .toArray.sortBy { case (us, e) => (us, e.event_id) }
    var st = st0
    val out = Seq.newBuilder[Session]
    def close(o: OpenSession): Unit = {
      out += Session(uid, st.nextIdx, fromMicros(o.startUs),
        fromMicros(o.lastUs + gapUs), o.cnt, o.maxValue)
      st = SessState(st.nextIdx + 1, None)
    }
    sorted.foreach { case (us, e) =>
      st.open match {
        case Some(o) if us >= o.lastUs + gapUs || o.cnt >= cap =>
          close(o)
          st = st.copy(open = Some(OpenSession(us, us, 1L, e.value)))
        case Some(o) =>
          // max, not us: a cross-micro-batch event above the watermark but
          // older than the open session's last event must only add to
          // cnt/maxValue — never regress the session end or the gap anchor
          st = st.copy(open = Some(OpenSession(o.startUs, math.max(o.lastUs, us),
            o.cnt + 1, math.max(o.maxValue, e.value))))
        case None =>
          st = st.copy(open = Some(OpenSession(us, us, 1L, e.value)))
      }
    }
    (st, out.result())
  }

  /** Sessionize `events` per user: close a session when the next event is
   *  `gapMillis` or later after the previous one, or when it already holds
   *  `cap` events. Deterministic: events fold in (ts, event_id) order.
   *  Batch form — input per key is complete, so the trailing open session is
   *  flushed at end of input. */
  def sessions(spark: SparkSession, events: Dataset[Event], gapMillis: Long,
      cap: Int): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMillis * 1000L
    val capN = cap
    def fold(uid: Long, it: Iterator[Event],
        state: GroupState[SessState]): Iterator[Session] = {
      var (st, closed) = foldEvents(uid,
        state.getOption.getOrElse(SessState(0L, None)), it, gapUs, capN)
      val tail = st.open.map { o =>
        Session(uid, st.nextIdx, fromMicros(o.startUs),
          fromMicros(o.lastUs + gapUs), o.cnt, o.maxValue)
      }
      (closed ++ tail).iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(fold)
  }

  /** STREAMING form of [[sessions]]: the open session lives in [[GroupState]]
   *  across micro-batches and is closed either by a later event (gap/cap) or
   *  by an EVENT-TIME TIMEOUT once the watermark passes `last_ts + gap` — so
   *  a user who goes quiet still gets their final session emitted, and state
   *  for quiet users is dropped (bounded state). Input must carry a
   *  watermark on `ts`. Assumes per-key arrival order across micro-batches
   *  follows event time (the usual replay/ingest shape); events later than
   *  the open session's last timestamp minus the watermark delay would be
   *  dropped by the watermark anyway. */
  def sessionsStream(spark: SparkSession, events: Dataset[Event],
      gapMillis: Long, cap: Int): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMillis * 1000L
    val capN = cap
    def fold(uid: Long, it: Iterator[Event],
        state: GroupState[SessState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // watermark passed last_ts + gap: no event can extend the session
        val st = state.get
        val out = st.open.map { o =>
          Session(uid, st.nextIdx, fromMicros(o.startUs),
            fromMicros(o.lastUs + gapUs), o.cnt, o.maxValue)
        }
        state.remove()
        out.iterator
      } else {
        val (st, closed) = foldEvents(uid,
          state.getOption.getOrElse(SessState(0L, None)), it, gapUs, capN)
        st.open match {
          case Some(o) =>
            state.update(st)
            // fire once the watermark clock passes the session's quiet gap;
            // a session already expired relative to the watermark (boundary-
            // late events) still needs a FUTURE timestamp — Spark rejects
            // timeouts at or before the current watermark — so clamp to
            // watermark+1ms and let the next micro-batch flush it
            state.setTimeoutTimestamp(Math.max(
              Math.floorDiv(o.lastUs + gapUs, 1000L),
              state.getCurrentWatermarkMs() + 1L))
          case None => state.remove()
        }
        closed.iterator
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout)(fold)
  }
}
