package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling with gap fill: align events to a fixed-width
  * bucket grid per key and EMIT the empty buckets — the step every
  * downsample/forecast/SLA pipeline needs and plain `groupBy(window)`
  * does not give (it only emits buckets that contain data).
  *
  * Mechanics: bucket = ts − (ts mod width) in exact integer micros (no
  * float division — epoch micros exceed a double's 2^53 integer range);
  * per-key [min, max] bucket bounds from the aggregated frame (tiny: one
  * row per key); the dense grid is `sequence(lo, hi, width)` EXPLODED —
  * a generator, so grid rows stream without materializing a driver-side
  * range — left-joined back to the sparse aggregate.
  *
  * Scale notes: the join is an equi-join on (key, bucket), shuffle-keyed
  * and AQE-managed; grid cardinality per key = span/width, so bound the
  * bucket width to the key's expected span (a year of 1-second buckets on
  * one key is 31M rows — that is real output mass, not overhead). The
  * sparse aggregate is computed ONCE and feeds both the bounds probe and
  * the join (localCheckpoint).
  */
object Resample {

  /** Per-(keys, bucket) counts over a dense per-key bucket grid; gap
    * buckets carry n = 0. `bucket_us` is the bucket start in epoch micros.
    */
  def gapFilledCounts(df: DataFrame, tsCol: String, keyCols: Seq[String],
                      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val us = unix_micros(col(tsCol))
    val bucket = us - pmod(us, lit(bucketMicros))
    val sparse = df
      .select(keyCols.map(col) :+ bucket.as("bucket_us"): _*)
      .groupBy(keyCols.map(col) :+ col("bucket_us"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the bounds probe AND the join
    val bounds = sparse.groupBy(keyCols.map(col): _*)
      .agg(min("bucket_us").as("__lo"), max("bucket_us").as("__hi"))
    val grid = bounds.select(keyCols.map(col) :+
      explode(sequence(col("__lo"), col("__hi"), lit(bucketMicros)))
        .as("bucket_us"): _*)
    grid.join(sparse, keyCols :+ "bucket_us", "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Dense per-key bucket grid with LINEAR INTERPOLATION across gaps —
    * the right fill for sampled level metrics (queue depth, temperature,
    * account balance) where [[gapFilledCounts]]'s zero-fill is the right
    * fill for event counts: an absent reading means "not measured", not
    * "was zero". Interior gaps interpolate between the nearest present
    * neighbors; leading/trailing gaps stay null (extrapolation is a
    * modeling choice, not a resample); `is_interpolated` flags fills.
    *
    * ONE window shuffle serves everything: the same (key, bucket)-sorted
    * partitions answer last-present-before (running frame) and
    * first-present-after (forward frame) — Spark evaluates both frames
    * off one sort. The interpolation weight (b−b_prev)/(b_next−b_prev)
    * divides exact integer micros, so fills are identical IEEE754 on any
    * engine given identical neighbor values.
    */
  def interpolate(sparse: DataFrame, keyCols: Seq[String], orderCol: String,
                  valueCol: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val keys = keyCols.map(col)
    val snapped = sparse.select(
      keys ++ Seq(col(orderCol).as("bucket_us"),
        col(valueCol).cast("double").as("_v")): _*)
      .localCheckpoint(true) // feeds the bounds probe AND the join
    val bounds = snapped.groupBy(keys: _*)
      .agg(min("bucket_us").as("__lo"), max("bucket_us").as("__hi"))
    val grid = bounds.select(keys :+
      explode(sequence(col("__lo"), col("__hi"), lit(bucketMicros)))
        .as("bucket_us"): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("bucket_us"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prevV = last(col("_v"), ignoreNulls = true).over(back)
    val prevB = last(when(col("_v").isNotNull, col("bucket_us")),
      ignoreNulls = true).over(back)
    val nextV = first(col("_v"), ignoreNulls = true).over(fwd)
    val nextB = first(when(col("_v").isNotNull, col("bucket_us")),
      ignoreNulls = true).over(fwd)
    grid.join(snapped, keyCols :+ "bucket_us", "left")
      .withColumn("_pv", prevV).withColumn("_pb", prevB)
      .withColumn("_nv", nextV).withColumn("_nb", nextB)
      .select(keys ++ Seq(
        col("bucket_us"),
        when(col("_v").isNotNull, col("_v"))
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv") + (col("_nv") - col("_pv")) *
              ((col("bucket_us") - col("_pb")).cast("double") /
                (col("_nb") - col("_pb")).cast("double")))
          .otherwise(lit(null).cast("double")).as("v"),
        (col("_v").isNull && col("_pv").isNotNull && col("_nv").isNotNull)
          .as("is_interpolated")): _*)
  }
}
