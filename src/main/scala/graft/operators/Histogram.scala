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

  /** Equi-DEPTH histogram: buckets hold (approximately) equal row counts
    * instead of equal value ranges — the shape profilers and optimizers
    * actually want on skewed columns, where equi-width piles everything
    * into one bin. Same two-pass discipline as [[equiWidth]], but the
    * pass-one aggregate is the exact interpolated percentile thresholds
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, the equivalence the
    * rel_percentiles gate pins) broadcast back; bucket assignment is the
    * Rfm-style "count of edges strictly below the value" — a pure
    * VALUE-dependent expression, so it needs no sort, no ntile global
    * window, and ties land in the lower bucket deterministically on any
    * engine. Duplicate-heavy columns make some buckets fat — that is the
    * correct equi-depth semantics (a value never splits across buckets),
    * not an artifact.
    *
    * Scale: pass one is a single-row exact-percentile aggregate — Spark
    * buffers the WHOLE column in one aggregation buffer, which is the
    * oracle-gated default but an OOM at a 100 TB single group. `accuracy`
    * is the knob: a positive value swaps in `percentile_approx` at that
    * accuracy (bounded, mergeable sketch), same plan shape and the same
    * bucket expression downstream (ThresholdKnobSpec pins agreement).
    * Pass two is one broadcast join + one ≤nBuckets-row hash aggregate.
    */
  def equiDepth(df: DataFrame, valueCol: String, nBuckets: Int,
                accuracy: Int = 0): DataFrame = {
    require(nBuckets > 1, "need at least two buckets")
    val v = col(valueCol)
    val qs = array((1 until nBuckets).map(i =>
      lit(i.toDouble / nBuckets)): _*)
    val edgeAgg =
      if (accuracy > 0) percentile_approx(v.cast("double"), qs, lit(accuracy))
      else percentile(v.cast("double"), qs)
    val edges = df.filter(v.isNotNull).agg(edgeAgg.as("_edges"))
    val bucket = (0 until nBuckets - 1)
      .map(i => when(v.cast("double") > col("_edges").getItem(i), 1L)
        .otherwise(0L))
      .foldLeft(lit(0L))(_ + _)
    df.filter(v.isNotNull)
      .crossJoin(broadcast(edges))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("cnt"),
        min(v.cast("double")).as("lo_val"),
        max(v.cast("double")).as("hi_val"))
  }

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
