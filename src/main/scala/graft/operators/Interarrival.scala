package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key inter-arrival statistics — mean gap and coefficient of
  * variation, the burstiness signature behind bot/automation detection
  * (CV ≈ 0: metronome retries; CV ≈ 1: Poisson humans; CV ≫ 1: bursts).
  *
  * Exactness: gaps are integer microseconds; the variance comes from the
  * integer sufficient statistics (n·Σg² − (Σg)²) / n² with Σg and Σg²
  * routed through decimal — EXACT integers on both engines (DuckDB
  * replays them in HUGEINT), so the numerator is non-negative by
  * Cauchy-Schwarz BEFORE any float op and the only doubles are the final
  * divisions/sqrt on identical operands (the [[Trend]] discipline —
  * float `var_pop` would smear with partition order). One window shuffle
  * on the key, one hash agg.
  */
object Interarrival {

  /** (key, n_gaps, mean_gap_s, cv) per key with ≥ 2 events; zero-mean
    * (all-simultaneous) keys report null cv.
    */
  def stats(df: DataFrame, keyCol: String, tsCol: String,
            idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val gaps = df
      .withColumn("_gap", us - lag(us, 1).over(w))
      .filter(col("_gap").isNotNull)
    val g = col("_gap").cast("decimal(19,0)")
    val agg = gaps.groupBy(keyCol).agg(
      count(lit(1)).as("n_gaps"),
      sum(g).as("_sg"),
      sum(g * g).as("_sq"))
    val n = col("n_gaps").cast("decimal(38,0)")
    val num = (n * col("_sq") - col("_sg") * col("_sg")).cast("double")
    val varPop = num / (col("n_gaps").cast("double") * col("n_gaps").cast("double"))
    val meanUs = col("_sg").cast("double") / col("n_gaps").cast("double")
    agg.select(
      col(keyCol),
      col("n_gaps"),
      (meanUs / 1000000.0).as("mean_gap_s"),
      when(meanUs > 0, sqrt(varPop) / meanUs).otherwise(lit(null))
        .as("cv"))
  }
}
