package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time stream processing over the `events` shape (ts, user_id,
  * event_type, value) — the Structured-Streaming side of the batch
  * event-time queries in [[graft.queries.RefQueries]] (tumbling /
  * sliding / sessionize). The reference's "real-time" surface is
  * event-driven batch (SURVEY.md §2.9); these operators are the shapes a
  * true streaming deployment of the same pipeline needs:
  *
  *   - [[windowedCounts]]: watermarked tumbling-window aggregation —
  *     late data beyond the watermark is dropped, windows emit once
  *     final (append mode);
  *   - [[sessionWindows]]: declarative gap-based sessions via the
  *     built-in `session_window` (state store managed by Spark);
  *   - [[sessionize]]: the same sessions via
  *     `flatMapGroupsWithState` + event-time timeout — the custom-state
  *     escape hatch for semantics `session_window` cannot express
  *     (per-session aggregates beyond algebraic ones, custom gap rules).
  *
  * Scale shape: all three are keyed-state operators whose state is
  * partitioned by group key across executors; nothing accumulates on the
  * driver, and watermarks bound state size (sessions for a user whose
  * events stopped arriving are emitted and evicted).
  */
object EventStreams {

  /** Tumbling 1-hour counts with a 1-hour watermark. Works identically on
    * batch and streaming frames (same plan, no code fork). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Declarative gap sessions via the built-in session_window. */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Streaming exactly-once dedup: drop events whose `event_id` was
    * already seen, keeping per-key state only until the watermark passes
    * (bounded state — the streaming analog of the batch key-dedup A1 and
    * of the marker-file idempotency the reference uses per file). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join — attribute each click to the same
    * user's impressions within the preceding `windowMinutes`. Both sides
    * carry watermarks, so the join state (buffered unmatched rows) is
    * EVICTED once the event-time bound passes — the property that keeps a
    * forever-running join's state finite. Equi-key on user_id + a time
    * interval condition: Spark plans a streaming symmetric hash join
    * partitioned by the key. */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30): DataFrame =
    attributionJoin(impressions, clicks, windowMinutes, "inner")

  /** The shared body of both attribution joins — ONE definition of the
    * watermarks, the interval condition, and the output projection, so
    * the inner and outer variants can never drift (the join type and
    * the null-extension semantics it brings are the ONLY difference). */
  private def attributionJoin(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int, joinType: String): DataFrame = {
    val imp = impressions
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("imp_user"), col("ts").as("imp_ts"),
        col("value").as("imp_value"))
    val clk = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    clk.join(imp,
      col("user_id") === col("imp_user") &&
        col("imp_ts") <= col("click_ts") &&
        col("imp_ts") >= col("click_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES"),
      joinType)
      .select(col("user_id"), col("imp_ts"), col("click_ts"),
        col("imp_value"), col("click_value"))
  }

  /** Stream-stream LEFT OUTER interval join — the attribution-with-
    * misses shape: every click attributed to the same user's
    * impressions within the preceding `windowMinutes`, and a click with
    * NO qualifying impression still emitted exactly once, with null
    * impression columns. Matched pairs emit on co-presence, like the
    * inner join; the null row for an unmatched click emits only at
    * STATE EVICTION — when the watermark proves no in-window impression
    * can still arrive — so the outer variant's emissions are driven by
    * watermark ADVANCE across micro-batches, not by data arrival. A
    * caller that needs every unmatched click flushed (a bounded drain)
    * must push the watermark past the last click's window with sentinel
    * waves; the inner join needs no such discipline (see the
    * determinism note on [[StreamQueries.streamIntervalJoin]]). */
  def clickAttributionOuter(impressions: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 30): DataFrame =
    attributionJoin(impressions, clicks, windowMinutes, "leftOuter")

  /** Stream-static enrichment — join each event against a STATIC (or
    * slowly-refreshed) dimension table by key. The static side needs no
    * watermark and holds no streaming state: Spark re-plans it per
    * micro-batch and broadcasts it when it fits (`broadcast` hinted here
    * — dims are small by definition), so the stream never shuffles. This
    * is the streaming face of the batch broadcast dim join (J4) and the
    * standard shape for attaching user/product attributes to a live
    * event stream. */
  def enrichEvents(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)
  /** Internal per-user open-session state (public: the state-store
    * encoder's generated code must reach its accessors at runtime). */
  final case class SessState(startMs: Long, lastMs: Long,
      nEv: Long, total: Double)

  val DefaultGapMs: Long = 30L * 60 * 1000

  /** Custom stateful sessionization: 30-minute-gap sessions per user,
    * emitted when the event-time watermark passes the session's gap
    * horizon (`flatMapGroupsWithState` + EventTimeTimeout). Equivalent to
    * the batch `q_events_sessionize` semantics, expressed as incremental
    * keyed state. Boundary rule: an event exactly at lastTs + gap starts
    * a NEW session (diff >= gap) — same rule as `session_window` and the
    * batch sessionizers. */
  def sessionize(events: Dataset[Ev],
      gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionFn(gapMs) _)
  }

  private def sessionFn(gapMs: Long)(
      userId: Long, rows: Iterator[Ev],
      state: GroupState[SessState]): Iterator[Session] = {
    val out = Seq.newBuilder[Session]
    var cur = state.getOption
    if (state.hasTimedOut) {
      // Watermark passed the open session's gap horizon: final, emit.
      cur.foreach(st => out += closed(userId, st))
      state.remove()
    } else {
      // Fold this batch's events in time order; sessions closed WITHIN
      // the batch emit immediately, the trailing open session parks in
      // state with an event-time timeout at lastTs + gap.
      for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
        val t = e.ts.getTime
        cur = cur match {
          case Some(st) if t - st.lastMs < gapMs =>
            Some(st.copy(lastMs = math.max(st.lastMs, t),
              nEv = st.nEv + 1, total = st.total + e.value))
          case Some(st) =>
            out += closed(userId, st)
            Some(SessState(t, t, 1, e.value))
          case None =>
            Some(SessState(t, t, 1, e.value))
        }
      }
      cur.foreach { st =>
        state.update(st)
        // The timeout must sit strictly beyond the current watermark.
        state.setTimeoutTimestamp(
          math.max(st.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
      }
    }
    out.result().iterator
  }

  private def closed(userId: Long, st: SessState): Session =
    Session(userId, new Timestamp(st.startMs), new Timestamp(st.lastMs),
      st.nEv, st.total)

  /** The same gap sessions on Spark 4's `transformWithState` — the
    * successor to `flatMapGroupsWithState` (typed per-key state
    * primitives, explicit timers, RocksDB-backed state store; the query
    * must run with
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`). Semantics are identical to
    * [[sessionize]] incl. the diff >= gap boundary rule — proven by the
    * shared spec scenario. */
  def sessionizeTws(events: Dataset[Ev],
      gapMs: Long = DefaultGapMs): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }
}

/** Per-user session state machine for [[EventStreams.sessionizeTws]].
  * Fold this batch's events in time order (sessions closed within the
  * batch emit immediately); the trailing open session parks in a typed
  * ValueState with an event-time timer at its gap horizon. A stale timer
  * (from a horizon the batch has since advanced past) self-heals: the
  * expiry handler re-registers instead of emitting early. */
final class SessionProcessor(gapMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStreams.Ev, EventStreams.Session] {
  import EventStreams.{Ev, SessState, Session}
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig, TimeMode, TimerValues}

  @transient private var sess:
    org.apache.spark.sql.streaming.ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[SessState]("sess",
      org.apache.spark.sql.Encoders.product[SessState], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[Ev],
      tv: TimerValues): Iterator[Session] = {
    val out = Seq.newBuilder[Session]
    var cur = if (sess.exists()) Some(sess.get()) else None
    for (e <- rows.toSeq.sortBy(_.ts.getTime)) {
      val t = e.ts.getTime
      cur = cur match {
        case Some(st) if t - st.lastMs < gapMs =>
          Some(st.copy(lastMs = math.max(st.lastMs, t),
            nEv = st.nEv + 1, total = st.total + e.value))
        case Some(st) =>
          out += emit(userId, st)
          Some(SessState(t, t, 1, e.value))
        case None =>
          Some(SessState(t, t, 1, e.value))
      }
    }
    cur.foreach { st =>
      sess.update(st)
      getHandle.registerTimer(
        math.max(st.lastMs + gapMs, tv.getCurrentWatermarkInMs() + 1))
    }
    out.result().iterator
  }

  override def handleExpiredTimer(userId: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[Session] =
    if (!sess.exists()) Iterator.empty
    else {
      val st = sess.get()
      if (tv.getCurrentWatermarkInMs() >= st.lastMs + gapMs) {
        sess.clear()
        Iterator.single(emit(userId, st))
      } else {
        // stale timer from an earlier horizon — re-arm, don't emit
        getHandle.registerTimer(
          math.max(st.lastMs + gapMs, tv.getCurrentWatermarkInMs() + 1))
        Iterator.empty
      }
    }

  private def emit(userId: Long, st: SessState): Session =
    Session(userId, new Timestamp(st.startMs), new Timestamp(st.lastMs),
      st.nEv, st.total)
}
