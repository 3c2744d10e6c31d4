package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution drift between groups — binned two-sample Kolmogorov-
  * Smirnov: the max CDF gap between every pair of groups over a SHARED
  * equi-width bin grid. The classic corpus monitor ("did src7's length
  * distribution move this week?") without the per-pair global sort the
  * textbook KS needs: one scan bins everything ([[Histogram]] arithmetic,
  * identical IEEE754 ops), then the whole computation lives on
  * groups×buckets rows — dense-spined so empty bins carry the running
  * CDF, cumulative-summed per group (bucket-count-sized partitions), and
  * pair-joined on the bucket. Binning makes it a lower bound on exact KS
  * (within-bin movement is invisible); tighten with more buckets.
  * Counts are exact integers; the only doubles are the per-bin CDF
  * divisions and the final max-of-abs — a MAX, not a sum, so partition
  * order can never smear it.
  */
object Drift {

  /** (g1, g2, ks) for every unordered group pair, g1 < g2 lexically. */
  def ksByGroup(df: DataFrame, groupCol: String, valueCol: String,
                buckets: Int): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull && col(groupCol).isNotNull)
    val bounds = rows.agg(min(v).as("_lo"), max(v).as("_hi"))
    val width = (col("_hi") - col("_lo")) / buckets
    val bucket = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(floor((v - col("_lo")) / width), lit(buckets - 1L))
        .cast("long"))
    val counts = rows.crossJoin(broadcast(bounds))
      .withColumn("bucket", bucket)
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(groupCol).agg(sum("c").as("tot"))
    val spine = counts.select(groupCol).distinct()
      .crossJoin(df.sparkSession.range(buckets).toDF("bucket"))
    val wcum = Window.partitionBy(groupCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cdf = spine.join(counts, Seq(groupCol, "bucket"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum", sum("c").over(wcum))
      .join(totals, Seq(groupCol))
      .withColumn("cdf", col("cum").cast("double") / col("tot").cast("double"))
    val a = cdf.select(col(groupCol).as("g1"), col("bucket"),
      col("cdf").as("cdf1"))
    val b = cdf.select(col(groupCol).as("g2"), col("bucket"),
      col("cdf").as("cdf2"))
    a.join(b, Seq("bucket")).filter(col("g1") < col("g2"))
      .groupBy("g1", "g2")
      .agg(max(abs(col("cdf1") - col("cdf2"))).as("ks"))
  }

  /** Population Stability Index of every group against a designated
    * reference group: Σ_bins (p_g − p_ref)·ln(p_g / p_ref) over the same
    * shared equi-width grid as [[ksByGroup]] — the model-monitoring
    * standard where KS answers "are they different" and PSI answers "how
    * much has the mass moved" (rule of thumb: <0.1 stable, >0.25 shifted).
    *
    * Empty bins would put 0 in the log, so every bin count gets the
    * continuity correction +0.5 (Jeffreys-style smoothing: p = (c+0.5)/
    * (tot + buckets/2)) — deterministic, engine-identical arithmetic,
    * unlike the ad-hoc "replace 0 with 1e-4" convention which makes PSI
    * depend on an arbitrary constant harder to defend in an oracle.
    *
    * Scale shape: identical to KS until the last step — one scan to bin,
    * dense groups×buckets spine, then a bucket-keyed equi-join of the
    * reference column against every other group and one per-group sum.
    * Per-bin terms are single-float-op chains on identical doubles; the
    * final sum is buckets-sized per group, association noise far below
    * 6-dp rounding.
    */
  def psiByGroup(df: DataFrame, groupCol: String, valueCol: String,
                 buckets: Int, refGroup: String): DataFrame = {
    require(buckets >= 2, "need at least two buckets")
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull && col(groupCol).isNotNull)
    val bounds = rows.agg(min(v).as("_lo"), max(v).as("_hi"))
    val width = (col("_hi") - col("_lo")) / buckets
    val bucket = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(floor((v - col("_lo")) / width), lit(buckets - 1L))
        .cast("long"))
    val counts = rows.crossJoin(broadcast(bounds))
      .withColumn("bucket", bucket)
      .groupBy(groupCol, "bucket").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(groupCol).agg(sum("c").as("tot"))
    val spine = counts.select(groupCol).distinct()
      .crossJoin(df.sparkSession.range(buckets).toDF("bucket"))
    val p = (col("c").cast("double") + lit(0.5)) /
      (col("tot").cast("double") + lit(buckets.toDouble / 2))
    val dense = spine.join(counts, Seq(groupCol, "bucket"), "left")
      .na.fill(0L, Seq("c"))
      .join(totals, Seq(groupCol))
      .select(col(groupCol), col("bucket"), p.as("p"))
    val ref = dense.filter(col(groupCol) === refGroup)
      .select(col("bucket"), col("p").as("p_ref"))
    dense.filter(col(groupCol) =!= refGroup)
      .join(ref, Seq("bucket"))
      .groupBy(col(groupCol).as("g"))
      .agg(sum((col("p") - col("p_ref")) * log(col("p") / col("p_ref")))
        .as("psi"))
  }
}
