package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seasonal-profile strength over a bucketed series: how much of a
  * series' variance is explained by its position in a fixed cycle
  * (hour-of-day, day-of-week) — the STL-lite diagnostic behind "is this
  * traffic diurnal or flat?", and the decision input for seasonal
  * forecast models and anomaly baselines. Strength = 1 −
  * Var(residual)/Var(total) with the seasonal component the per-phase
  * mean — exactly the R² of the one-hot phase regression, 0 for a flat
  * profile, →1 when the cycle explains everything.
  *
  * Everything reduces to EXACT integer sufficient statistics via the
  * within-group variance identity Σ(x−μ_phase)² = Σx² − Σ_p s_p²/n_p:
  * one (key, phase) hash agg yields (n_p, s_p = Σx, Σx²); the per-key
  * roll-up sums those integers exactly and the only floats are the ≤
  * cycle-length s_p²/n_p divisions — no per-row float pass at all, so
  * the plan never rescans the series and replays engine-identically
  * under 6-dp rounding. Peak phase = lexicographic struct-max over the
  * per-phase means with an earliest-phase tie-break.
  *
  * Scale shape: two hash aggregates, the second over keys×cycle rows.
  * No window, no join against the data.
  */
object Seasonality {

  /** Rows: (keys..., n_buckets, mu, strength, peak_phase, peak_mean).
    * `phase` = (orderCol div stepMicros) mod cycleLen — e.g. step 1 h,
    * cycle 24 → hour-of-day. Constant series report null strength.
    */
  def profileStrength(series: DataFrame, keyCols: Seq[String],
                      orderCol: String, valueCol: String,
                      stepMicros: Long, cycleLen: Int): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    require(cycleLen >= 2, "cycle needs at least two phases")
    val keys = keyCols.map(col)
    val phase = pmod(expr(s"$orderCol div ${stepMicros}L"), lit(cycleLen.toLong))
    val perPhase = series
      .groupBy(keys :+ phase.as("_p"): _*)
      .agg(count(lit(1)).as("_np"),
        sum(col(valueCol)).as("_sp"),
        sum(col(valueCol) * col(valueCol)).as("_sxxp"))
    val phaseMean = col("_sp").cast("double") / col("_np").cast("double")
    perPhase
      .withColumn("_term",
        col("_sp").cast("double") * col("_sp").cast("double")
          / col("_np").cast("double"))
      .groupBy(keys: _*)
      .agg(
        sum(col("_np")).as("n_buckets"),
        sum(col("_sp")).as("_sx"),
        sum(col("_sxxp")).as("_sxx"),
        sum(col("_term")).as("_explained"),
        max(struct(phaseMean.as("_m"), (-col("_p")).as("_negp")))
          .as("_peak"))
      .select(keys ++ {
        val n = col("n_buckets").cast("double")
        val mu = col("_sx").cast("double") / n
        // Var_total·n = Σx² − n·μ² ; Var_resid·n = Σx² − Σ_p s_p²/n_p
        val totSS = col("_sxx").cast("double") - n * mu * mu
        val residSS = col("_sxx").cast("double") - col("_explained")
        Seq(
          col("n_buckets"), mu.as("mu"),
          when(totSS > 0, lit(1.0) - residSS / totSS)
            .otherwise(lit(null).cast("double")).as("strength"),
          (-col("_peak").getField("_negp")).as("peak_phase"),
          col("_peak").getField("_m").as("peak_mean"))
      }: _*)
  }
}
