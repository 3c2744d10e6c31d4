package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival estimation over an event log: time from an
  * origin event to a target event per subject, RIGHT-CENSORED at the
  * subject's last observed activity — "how long until a signup
  * purchases, counting the users who haven't yet?" Naive conversion-time
  * averages silently drop the not-yet-converted and bias fast; KM is the
  * estimator that uses them (a censored subject testifies "survived at
  * least this long" and then leaves the risk set).
  *
  * Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ): dᵢ = conversions at duration tᵢ, nᵢ =
  * subjects still at risk. The product is computed as exp(Σ ln(1−dᵢ/nᵢ))
  * over an ordered window — each term is a division of exact integers
  * then one ln, the window sum is sequential in duration order on both
  * engines, so the result is bit-identical; the dᵢ=nᵢ row (risk set
  * exhausted by events) would put 0 in the log, so a cumulative flag
  * pins survival to exactly 0.0 from that row on instead.
  *
  * Scale shape: one subject-keyed shuffle does all the per-subject
  * reduction (origin probe and outcome agg are co-partitioned on the
  * same key); the KM table itself is duration-cardinality-sized
  * (horizon/step rows), so its ordered window is a diagnostic-sized
  * frame, not a data-sized one — at true scale partition the study by a
  * cohort key and this generalizes per key.
  */
object Survival {

  /** Rows (one per duration with ≥1 conversion): duration (in steps),
    * n_risk, n_events, n_censored, survival.
    */
  def kaplanMeier(events: DataFrame, subjectCol: String, tsCol: String,
                  typeCol: String, originType: String, targetType: String,
                  stepMicros: Long): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    val us = unix_micros(col(tsCol))
    val base = events
      .filter(col(subjectCol).isNotNull && col(tsCol).isNotNull)
      .select(col(subjectCol).as("_s"), us.as("_us"), col(typeCol).as("_t"))
    val origins = base.filter(col("_t") === originType)
      .groupBy("_s").agg(min("_us").as("_t0"))
    // subject-keyed join + re-aggregate: same hash key, one exchange
    val subj = base.join(origins, "_s")
      .groupBy("_s").agg(
        min(when(col("_t") === targetType && col("_us") >= col("_t0"),
          col("_us"))).as("_tt"),
        max(col("_us")).as("_tend"),
        min(col("_t0")).as("_t0"))
    val dur = subj.select(
      when(col("_tt").isNotNull,
        expr(s"(_tt - _t0) div ${stepMicros}L"))
        .otherwise(expr(s"(_tend - _t0) div ${stepMicros}L")).as("duration"),
      col("_tt").isNotNull.cast("long").as("_e"))
    val tbl = dur.groupBy("duration").agg(
      sum(col("_e")).as("n_events"),
      (count(lit(1)) - sum(col("_e"))).as("n_censored"))
    val tot = dur.agg(count(lit(1)).as("_N"))
    val w = Window.orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = tbl.crossJoin(broadcast(tot))
      .withColumn("_cum", sum(col("n_events") + col("n_censored")).over(w))
      .withColumn("n_risk",
        col("_N") - col("_cum") + col("n_events") + col("n_censored"))
      .withColumn("_term",
        when(col("n_events") < col("n_risk"),
          log(lit(1.0) - col("n_events").cast("double") /
            col("n_risk").cast("double"))))
      .withColumn("_zero",
        max((col("n_events") === col("n_risk")).cast("int")).over(w))
      .withColumn("survival",
        when(col("_zero") === 1, lit(0.0)).otherwise(exp(sum(col("_term")).over(w))))
    out.filter(col("n_events") > 0)
      .select("duration", "n_risk", "n_events", "n_censored", "survival")
  }
}
