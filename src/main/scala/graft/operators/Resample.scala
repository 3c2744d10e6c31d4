package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
