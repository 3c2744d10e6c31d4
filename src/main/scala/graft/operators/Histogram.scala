package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Equi-width histogram — the profiling primitive behind distribution drift
  * checks and binned feature engineering. Two passes by construction (the
  * bin width IS a global aggregate): one min/max aggregate (single row,
  * broadcast back), then one bucket-assignment + count aggregate. The
  * bucket arithmetic is written as the exact expression
  * `floor((x - lo) / ((hi - lo) / n))` (capped into the last bucket so the
  * maximum lands in bucket n-1, not a phantom bucket n) so any engine
  * replaying the same IEEE754 ops bins identically.
  *
  * Scale shape: the min/max agg is a map-side-combined single-row shuffle;
  * the histogram agg shuffles n-buckets rows at most. Empty buckets are
  * absent from the output (sparse histogram) — zero-filling would need a
  * generated bucket spine, which callers can left-join on when they want
  * dense output.
  */
object Histogram {

  def equiWidth(df: DataFrame, valueCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "need at least one bucket")
    val v = col(valueCol)
    val bounds = df.filter(v.isNotNull).agg(min(v).as("_lo"), max(v).as("_hi"))
    val width = (col("_hi") - col("_lo")) / nBuckets
    val bucket = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(floor((v - col("_lo")) / width), lit(nBuckets - 1L))
        .cast("long"))
    df.filter(v.isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("cnt"),
        // bin edges re-derived from the same broadcast bounds, exact same
        // arithmetic the oracle replays; min() collapses the constant
        min(col("_lo") + col("bucket") * width).as("bucket_lo"),
        min(col("_lo") + (col("bucket") + 1) * width).as("bucket_hi"))
  }
}
