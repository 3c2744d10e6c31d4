package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-sequence conversion funnels (ClickHouse `windowFunnel` /
  * Trino-style sequence matching — an operator family Spark lacks):
  * per entity, the greedy earliest-match level through `steps`, where
  * step i+1 must land strictly after step i and the WHOLE chain inside
  * `windowMicros` of the matched step-1 time.
  *
  * One shuffle total: `collect_list` the (ts, type) pairs per entity,
  * sort once, and fold the sequence with an `aggregate` higher-order
  * function whose accumulator is the array of matched step times — where
  * the chained-joins formulation re-shuffles (or at best re-exchanges)
  * the event table once per step. Per-entity memory is the entity's
  * event count, the same bound sessionization already accepts.
  *
  * Greedy earliest-match equals the conventional SQL chain
  * (t1 = min step1 ts; t_{i+1} = min step_{i+1} ts with ts > t_i and
  * ts ≤ t1 + window), which is exactly how the oracle replays it.
  * Matched times form a PREFIX of the steps (slot i+1 needs slot i
  * filled), so `level` = count of non-null slots.
  */
object Funnel {

  /** (entityCol, level) — level in 0..steps.length. */
  def levels(events: DataFrame, entityCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             windowMicros: Long): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(windowMicros > 0, "windowMicros must be > 0")
    val k = steps.length
    val stepsLit = array(steps.map(lit): _*)
    // sort key (tsu, type): deterministic fold order; strict > in the
    // match rule makes same-timestamp successors ineligible either way
    val seq0 = sort_array(collect_list(struct(
      unix_micros(col(tsCol)).as("tsu"), col(typeCol).as("et"))))
    // accumulator: array<long> of matched step times (null = unmatched).
    // An array (not a struct) because struct-field aliases are stripped
    // inside HOF lambdas; arrays index positionally by construction.
    val zero = array((0 until k).map(_ => lit(null).cast("long")): _*)
    def folded(seqCol: Column): Column = aggregate(seqCol, zero, (acc, e) => {
      val tsu = e.getField("tsu")
      val et = e.getField("et")
      transform(acc, (t, i) => {
        val isStep = et === element_at(stepsLit, i + 1)
        val prev = element_at(acc, i) // 1-based: slot i's predecessor
        val chainOk = when(i === 0, lit(true)).otherwise(
          prev.isNotNull && tsu > prev &&
            tsu <= element_at(acc, 1) + lit(windowMicros))
        // for i == 0 the window anchors AT this event, trivially inside
        when(t.isNotNull, t).otherwise(when(isStep && chainOk, tsu))
      })
    })
    events
      .groupBy(col(entityCol))
      .agg(seq0.as("__fn_seq"))
      .select(col(entityCol),
        size(filter(folded(col("__fn_seq")), t => t.isNotNull))
          .cast("long").as("level"))
  }
}
