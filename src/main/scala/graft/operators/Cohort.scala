package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention: group users by the week of their FIRST event and
  * track what fraction of each cohort stays active in the following
  * weeks — the canonical product-analytics triangle chart, and the
  * growth-vs-churn diagnostic every event warehouse ships.
  *
  * Week grain is `date_trunc('week')` (ISO Monday start, identical in
  * Spark and DuckDB); the offset is exact integer arithmetic on epoch
  * micros (UTC-pinned session → weeks are exact multiples of 604 800 s;
  * no float dates). Retention divides two exact longs, so the only
  * float op is one division of identical operands on any engine.
  *
  * Scale shape — three aggregates, ONE data-sized shuffle key:
  *   1. distinct (user, activity-week) + per-user first-event week come
  *      from the SAME user_id-hashed exchange (the groupBy(user, week)
  *      output is re-aggregated to min-week without moving), so raw
  *      events shuffle once, keyed by user;
  *   2. the cohort⋈activity join is user_id-equi on the two already
  *      co-partitioned frames;
  *   3. the final (cohort, offset) aggregate and the cohort-size window
  *      run on a triangle-sized frame (weeks² rows), negligible at any
  *      scale.
  * No global sort, no window over data-sized rows. Cohort size is read
  * off the offset-0 row (a user's first-event week IS an active week by
  * construction) rather than a second distinct-count pass.
  */
object Cohort {

  /** Rows: (cohort_week date, week_offset, n_active, retention). Every
    * cohort emits offset 0 with retention 1.0; weeks with no returning
    * users are absent (sparse triangle — callers gap-fill for display).
    */
  def weeklyRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val weekUs = unix_micros(date_trunc("week", col(tsCol)))
    // one shuffle on user_id: distinct activity weeks per user…
    val active = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("u"), weekUs.as("week_us"))
      .agg(count(lit(1)).as("_drop")).drop("_drop")
      .localCheckpoint(true) // feeds the cohort probe AND the join
    // …re-aggregated in place (same hash key) to the first-event week
    val cohort = active.groupBy(col("u"))
      .agg(min(col("week_us")).as("cohort_us"))
    val weekMicros = 7L * 24 * 3600 * 1000000L
    val triangle = active.join(cohort, "u")
      .groupBy(col("cohort_us"),
        ((col("week_us") - col("cohort_us")) / weekMicros)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val size = Window.partitionBy(col("cohort_us"))
    triangle
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(size))
      .select(
        to_date(timestamp_micros(col("cohort_us"))).as("cohort_week"),
        col("week_offset"), col("n_active"),
        (col("n_active").cast("double") /
          col("cohort_size").cast("double")).as("retention"))
  }
}
