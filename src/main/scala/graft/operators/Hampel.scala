package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hampel filter — rolling-window robust outlier detection over a
  * bucketed series: flag x_t when 0.6745·|x_t − med_t|/MAD_t exceeds the
  * cutoff, where med/MAD are computed over the ±k-bucket NEIGHBORHOOD.
  * The local companion to [[Robust.madAnomaly]]'s global screen: a level
  * shift moves the global median and masks post-shift spikes; the
  * rolling window adapts, flagging only what's anomalous FOR ITS
  * NEIGHBORHOOD (the despike standard in sensor pipelines).
  *
  * Spark-first shape — NO sliding window function: each series row
  * EXPANDS to the 2k+1 window centers it contributes to (map-side
  * offset spine, same discipline as [[RollingDistinct]]), and the two
  * by-construction passes (the MAD is a median OF deviations from the
  * window median) are two (key, center)-keyed hash aggregates over the
  * checkpointed expanded frame. Everything shuffles on (key, center);
  * at 100 TB the expansion is the honest 2k+1 output mass, not state.
  * Edge centers see their partial windows — standard filter behavior.
  *
  * Exactness: integer series ⇒ both exact interpolated percentiles are
  * the repo-pinned Spark `percentile` ≡ DuckDB `quantile_cont`; the
  * score is one multiply + divide of identical doubles.
  */
object Hampel {

  /** Per-key summary: (keys..., n_buckets, n_flagged, max_score,
    * first_flagged_us). Degenerate windows (MAD = 0) flag nothing.
    */
  def filter(series: DataFrame, keyCols: Seq[String], orderCol: String,
             valueCol: String, stepMicros: Long, k: Int,
             cutoff: Double = 3.5): DataFrame = {
    require(k >= 1, "window half-width must be >= 1")
    require(stepMicros > 0, "stepMicros must be positive")
    val keys = keyCols.map(col)
    val base = series.select(
      keys ++ Seq(col(orderCol).as("_b"),
        col(valueCol).cast("double").as("_v")): _*)
      .localCheckpoint(true) // contributes to 2k+1 centers AND scores
    val offsets = series.sparkSession.range(-k.toLong, k + 1L).toDF("_o")
    val contrib = base.crossJoin(broadcast(offsets))
      .select(keys ++ Seq((col("_b") + col("_o") * stepMicros).as("_c"),
        col("_v")): _*)
      .localCheckpoint(true) // feeds the median pass AND the MAD pass
    val centerKeys = keys :+ col("_c")
    val med = contrib.groupBy(centerKeys: _*)
      .agg(percentile(col("_v"), lit(0.5)).as("_rmed"))
    val mad = contrib.join(med, keyCols :+ "_c")
      .groupBy(centerKeys: _*)
      .agg(percentile(abs(col("_v") - col("_rmed")), lit(0.5)).as("_rmad"),
        min(col("_rmed")).as("_rmed"))
    val score = lit(0.6745) * abs(col("_v") - col("_rmed")) / col("_rmad")
    base.join(mad.withColumnRenamed("_c", "_b"), keyCols :+ "_b")
      .groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("_rmad") > 0 && score > cutoff, 1L).otherwise(0L))
          .as("n_flagged"),
        max(when(col("_rmad") > 0, score)).as("max_score"),
        min(when(col("_rmad") > 0 && score > cutoff, col("_b")))
          .as("first_flagged_us"))
  }
}
