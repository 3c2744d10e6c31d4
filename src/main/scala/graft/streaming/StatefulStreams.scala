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
