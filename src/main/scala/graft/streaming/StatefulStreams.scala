package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Custom-state streaming operators via `KeyValueGroupedDataset`
  * state APIs — the escape hatch when windowed aggregates can't express the
  * state machine (SURVEY.md §2.9 scale-mode extension).
  *
  * State is per-key and partitioned by the grouping key, so it scales with
  * key cardinality, not event volume; pair with watermark+timeout in
  * production to bound it (NoTimeout here keeps the example deterministic).
  */
object StatefulStreams {

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user totals with explicit keyed state (update-mode
    * output): each micro-batch folds its events into the stored
    * (count, sum) and emits the new running totals for the user.
    */
  def runningUserTotals(events: DataFrame): Dataset[UserTotal] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Double), UserTotal](GroupStateTimeout.NoTimeout) {
        case (uid, evs, state) =>
          val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0
          var v = v0
          evs.foreach { e => n += 1; v += e.value }
          state.update((n, v))
          UserTotal(uid, n, v)
      }
  }

  final case class SessionEvent(user_id: Long, ts: java.time.Instant)
  final case class SessState(startUs: Long, endUs: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: java.time.Instant,
                                 session_end: java.time.Instant, n_events: Long)

  /** Exact epoch micros of a timestamp — `java.sql.Timestamp.getTime`
    * truncates to millis, which broke session-boundary parity with the
    * micros-grained batch `session_window`; Instant keeps full precision.
    */
  private def us(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000
  private def instantOf(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)

  /** Inactivity-gap sessionization via `flatMapGroupsWithState` with an
    * EVENT-TIME timeout — the operator shape `session_window` can't
    * express once per-session logic grows beyond an aggregate (emit-once
    * on close, side effects, custom merge rules). A session closes two
    * ways: a later event arrives past the gap (emitted in that batch), or
    * the WATERMARK passes `last event + gap` with no successor — the
    * timeout arm — so closed sessions flow in append mode while open ones
    * occupy exactly one state row per active user (state scales with key
    * cardinality, bounded by the timeout; the watermark bounds replay).
    */
  def timeoutSessions(events: DataFrame, gapSeconds: Long,
                      watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val sp = events.sparkSession
    import sp.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, ClosedSession](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, evs, state) =>
          def emit(s: SessState) = ClosedSession(uid,
            instantOf(s.startUs), instantOf(s.endUs), s.n)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            // order within the batch: state transitions are sequential in
            // event time regardless of arrival order inside the batch
            val sorted = evs.toSeq.sortBy(e => us(e.ts))
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = us(e.ts)
              cur match {
                // <= : an event EXACTLY one gap after the session's
                // last event CONTINUES it, matching session_window, which
                // merges contiguous windows (boundary pinned by
                // StatefulStreamSpec's exact-gap fixture)
                case Some(s) if t - s.endUs <= gapUs =>
                  cur = Some(SessState(s.startUs, math.max(s.endUs, t), s.n + 1))
                case Some(s) =>
                  closed ::= emit(s)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // deadline in millis (the API's unit), strictly PAST the
              // boundary instant — an event at exactly last+gap still
              // continues the session, so the close can't fire at it; it
              // must also sit above the current watermark or the API
              // rejects it — clamping only DELAYS a close, never loses it
              val deadlineMs = Math.floorDiv(s.endUs + gapUs + 1000, 1000L)
              state.setTimeoutTimestamp(
                math.max(deadlineMs, state.getCurrentWatermarkMs + 1))
            }
            closed.reverse.iterator
          }
      }
  }

  /** [[timeoutSessions]] re-expressed on Spark 4's `transformWithState` —
    * the arbitrary-state successor of flatMapGroupsWithState: named
    * `ValueState` plus explicit event-time TIMERS replace the single
    * timeout slot (a processor may hold many states and timers per key,
    * which is what unlocks multi-machine-per-key patterns the old API
    * can't express). Same session algebra, so the same lag-gap SQL
    * replays it. Requires the RocksDB state-store provider — the caller
    * flips `spark.sql.streaming.stateStore.providerClass` for the query.
    */
  def twsSessions(events: DataFrame, gapSeconds: Long,
                  watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSeconds * 1000000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  private final class SessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessionEvent, ClosedSession] {
    @transient private var sess:
      org.apache.spark.sql.streaming.ValueState[SessState] = _

    override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sess = getHandle.getValueState[SessState]("sess",
        org.apache.spark.sql.Encoders.product[SessState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[SessionEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[ClosedSession] = {
      def emit(s: SessState) = ClosedSession(uid,
        instantOf(s.startUs), instantOf(s.endUs), s.n)
      val sorted = rows.toSeq.sortBy(e => us(e.ts))
      var closed = List.empty[ClosedSession]
      var cur = if (sess.exists()) Some(sess.get()) else None
      sorted.foreach { e =>
        val t = us(e.ts)
        cur match {
          // <=, matching timeoutSessions' and session_window's
          // merge-contiguous boundary semantics
          case Some(s) if t - s.endUs <= gapUs =>
            cur = Some(SessState(s.startUs, math.max(s.endUs, t), s.n + 1))
          case Some(s) =>
            closed ::= emit(s)
            cur = Some(SessState(t, t, 1))
          case None =>
            cur = Some(SessState(t, t, 1))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        // one live deadline per key: replace, don't accumulate; strictly
        // past last+gap (an exact-gap successor still continues)
        getHandle.listTimers().foreach(getHandle.deleteTimer)
        val deadlineMs = Math.floorDiv(s.endUs + gapUs + 1000, 1000L)
        getHandle.registerTimer(
          math.max(deadlineMs, timerValues.getCurrentWatermarkInMs + 1))
      }
      closed.reverse.iterator
    }

    override def handleExpiredTimer(uid: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[ClosedSession] = {
      if (!sess.exists()) Iterator.empty
      else {
        val s = sess.get()
        sess.clear()
        Iterator.single(ClosedSession(uid,
          instantOf(s.startUs), instantOf(s.endUs), s.n))
      }
    }
  }

  final case class UserCents(user_id: Long, n_events: Long, total_cents: Long)

  /** Exact-arithmetic twin of [[runningUserTotals]]: per-event
    * `floor(value * 100)` cents fold into integer keyed state. Integer
    * state makes the FINAL state invariant to micro-batch chopping and
    * within-batch arrival order (long addition commutes; double addition
    * does not), which is what lets a plain SQL aggregate replay the
    * stateful query end-to-end — the oracle gate for mapGroupsWithState.
    */
  def runningUserCents(events: DataFrame): Dataset[UserCents] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long), UserCents](GroupStateTimeout.NoTimeout) {
        case (uid, evs, state) =>
          var (n, c) = state.getOption.getOrElse((0L, 0L))
          evs.foreach { e => n += 1; c += math.floor(e.value * 100).toLong }
          state.update((n, c))
          UserCents(uid, n, c)
      }
  }
}
