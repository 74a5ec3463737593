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
 * session is flushed at end of input; a continuous-streaming deployment of
 * the same fold keeps the open session in [[GroupState]] and flushes on
 * event-time timeout instead (the state type is already shaped for it).
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

  /** Sessionize `events` per user: close a session when the next event is
   *  `gapMillis` or later after the previous one, or when it already holds
   *  `cap` events. Deterministic: events fold in (ts, event_id) order. */
  def sessions(spark: SparkSession, events: Dataset[Event], gapMillis: Long,
      cap: Int): Dataset[Session] = {
    import spark.implicits._

    val gapUs = gapMillis * 1000L
    def fold(uid: Long, it: Iterator[Event],
        state: GroupState[SessState]): Iterator[Session] = {
      val sorted = it.map(e => (toMicros(e.ts), e))
        .toArray.sortBy { case (us, e) => (us, e.event_id) }
      var st = state.getOption.getOrElse(SessState(0L, None))
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
            st = st.copy(open = Some(OpenSession(o.startUs, us,
              o.cnt + 1, math.max(o.maxValue, e.value))))
          case None =>
            st = st.copy(open = Some(OpenSession(us, us, 1L, e.value)))
        }
      }
      // batch semantics: input per key is complete — flush the open session.
      // (A streaming deployment keeps it: state.update(st) + event-time
      // timeout instead of this flush.)
      st.open.foreach(close)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout)(fold)
  }
}
