package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MAD-based robust outlier screen — the companion to the z-score screen
  * (`ev_anomaly`) for the heavy-tailed case where outliers inflate the
  * mean/stddev enough to mask themselves. The modified z-score
  * 0.6745·(x−median)/MAD (Iglewicz–Hoaglin) uses breakdown-point-0.5
  * estimators: half the data must be corrupted before the screen moves.
  *
  * Two passes BY CONSTRUCTION (the MAD is a median OF deviations from the
  * group median — the second statistic cannot exist until the first is
  * broadcast back): per-group exact interpolated median, broadcast join,
  * per-group exact median of |x−med|, broadcast join, then one flagging
  * aggregate. Both medians are Spark `percentile` ≡ DuckDB
  * `quantile_cont` (the rel_percentiles-pinned equivalence), so every
  * med/MAD is the identical double on both engines and every per-row
  * score is identical IEEE754 (one multiply, one divide of identical
  * operands).
  *
  * Scale: group-keyed exact percentiles buffer each group in one
  * aggregation buffer — right for low-cardinality diagnostic groups
  * (event types, sources); swap approx_percentile or SelectK's
  * bucket-rank pass for data-sized groups, same plan shape otherwise.
  */
object Robust {

  /** Per-group rows: (group, n, med, mad, n_flagged, max_score).
    * Degenerate groups (MAD = 0 — over half the values identical) flag
    * nothing and report null max_score rather than dividing by zero.
    */
  def madAnomaly(df: DataFrame, groupCol: String, valueCol: String,
                 cutoff: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull)
      .select(col(groupCol), v.as("_v"))
    val med = base.groupBy(groupCol)
      .agg(percentile(col("_v"), lit(0.5)).as("med"))
    val withDev = base.join(broadcast(med), Seq(groupCol))
      .withColumn("_dev", abs(col("_v") - col("med")))
    val mad = withDev.groupBy(groupCol)
      .agg(percentile(col("_dev"), lit(0.5)).as("mad"))
    val score = lit(0.6745) * col("_dev") / col("mad")
    withDev.join(broadcast(mad), Seq(groupCol))
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("mad") > 0 && score > cutoff, 1L).otherwise(0L))
          .as("n_flagged"),
        max(when(col("mad") > 0, score)).as("max_score"))
  }
}
