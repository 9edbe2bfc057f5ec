package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` schema (event_id, ts,
  * user_id, event_type, value, props).
  *
  * Design: each transform is written once against a plain DataFrame and
  * works in BOTH batch and streaming mode — `spark.read.parquet` or
  * `spark.readStream` feed the same function (`withWatermark` is a no-op
  * on batch inputs). [[graft.queries.EventQueries]] runs the batch twins
  * through the DuckDB oracle; [[EventStreamSpec]] replays the same data
  * through MemoryStream and asserts stream == batch.
  *
  * Scale notes: watermark + windowed aggregation keeps state bounded (old
  * windows are dropped past the watermark); sessionization state is
  * per-user and evicted on event-time timeout — the standard shapes that
  * survive unbounded input.
  */
object EventStreams {

  /** Tumbling 1-hour counts per event type. Streaming: append-mode
    * emission once the 10-minute watermark passes a window's end. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"),
        col("sum_value"))

  /** Gap-based sessions via the native `session_window` aggregation — the
    * declarative Spark-first form (Catalyst merges overlapping session
    * windows; state bounded by the watermark). */
  def sessionWindows(events: DataFrame, gap: String = "6 hours"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  // ---- custom stateful sessionizer (flatMapGroupsWithState) ------------

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(startUs: Long, endUs: Long, nEvents: Long)

  final case class Session(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)

  /** Custom per-user session state machine — the `flatMapGroupsWithState`
    * form of [[sessionWindows]], for session semantics the built-in can't
    * express (e.g. emitting intermediate per-session aggregates). Emits a
    * session when a new event arrives more than `gapUs` after the open
    * session's end, or when the event-time timeout fires (watermark
    * passed end + gap). */
  def sessionize(events: Dataset[Event], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        state.getOption.foreach(s =>
          out += Session(userId, s.startUs, s.endUs, s.nEvents))
        state.remove()
      } else {
        val sorted = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          val us = e.ts.getTime * 1000
          if (cur == null) cur = SessionState(us, us, 1)
          else if (us - cur.endUs > gapUs) {
            out += Session(userId, cur.startUs, cur.endUs, cur.nEvents)
            cur = SessionState(us, us, 1)
          } else cur = SessionState(cur.startUs, math.max(cur.endUs, us),
            cur.nEvents + 1)
        }
        if (cur != null) {
          state.update(cur)
          state.setTimeoutTimestamp(cur.endUs / 1000 + gapUs / 1000)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ---- streaming funnel (mapGroupsWithState) ----------------------------

  /** Per-user funnel state: first qualifying timestamp of each step (0 =
    * not reached) — three longs per user, the bounded-state shape the
    * batch twin ([[graft.queries.EventQueries]] `q_event_funnel`)
    * promises. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  final case class FunnelRow(user_id: Long, view_us: Option[Long],
                             click_us: Option[Long],
                             purchase_us: Option[Long], stage: Int)

  /** Streaming twin of the batch funnel: min-over-successors on a
    * per-user state machine. CAVEAT vs the batch form: the batch window
    * computes the global per-user minima in one pass, which is
    * order-insensitive; the streaming form is exactly equivalent only
    * when each user's events arrive in event-time order ACROSS
    * micro-batches (within a batch it sorts) — a step-k timestamp
    * already fixed is never revised by a later-arriving earlier event
    * (the same trade every low-latency funnel makes; replay through the
    * batch twin for the exact historical answer). Update-mode emission:
    * each batch emits the refreshed funnel row for users it touched. */
  def funnel(events: Dataset[Event], stepUs: Long,
             steps: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    val Seq(s1, s2, s3) = steps

    def update(userId: Long, it: Iterator[Event],
               state: GroupState[FunnelState]): FunnelRow = {
      var st = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
      it.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val us = e.ts.getTime * 1000
        // first-qualifying-only: a fixed step timestamp is never revised
        // (see the order-sensitivity caveat above)
        if (e.event_type == s1 && st.t1 == 0L)
          st = FunnelState(us, st.t2, st.t3)
        if (e.event_type == s2 && st.t1 != 0L && st.t2 == 0L
          && us >= st.t1 && us <= st.t1 + stepUs)
          st = FunnelState(st.t1, us, st.t3)
        if (e.event_type == s3 && st.t2 != 0L && st.t3 == 0L
          && us >= st.t2 && us <= st.t2 + stepUs)
          st = FunnelState(st.t1, st.t2, us)
      }
      state.update(st)
      val stage = if (st.t3 != 0L) 3 else if (st.t2 != 0L) 2
        else if (st.t1 != 0L) 1 else 0
      FunnelRow(userId, Option(st.t1).filter(_ != 0L),
        Option(st.t2).filter(_ != 0L), Option(st.t3).filter(_ != 0L), stage)
    }

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelRow](
        GroupStateTimeout.NoTimeout)(update)
  }
}
