package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classical two-sample hypothesis tests as single-pass aggregates —
  * the experimentation readout an event warehouse serves daily. Both
  * tests reduce to closed forms over EXACT sufficient statistics
  * (decimal sums, integer counts), so the heavy lifting is one hash
  * aggregate and the float work is a handful of scalar ops on identical
  * operands — engine-replayable to the last ulp, no per-row float pass.
  *
  * Significance is reported as the test STATISTIC (z / t), not a
  * p-value: erf/Student-CDF are library-specific special functions that
  * would make the result engine-dependent; the statistic is the portable
  * number (|z| > 1.96 ≈ 5%), and callers owning a stats library can map
  * it locally.
  */
object StatTests {

  /** Welch's unequal-variance t-test between every group pair (g1 < g2):
    * t = (μ₁−μ₂)/√(s₁²/n₁ + s₂²/n₂) with Welch–Satterthwaite dof.
    * Sums route through decimal(18,4) so partial-aggregation order can't
    * smear them — the sufficient statistics are EXACT and partitioning-
    * independent; the variance s² = (Σx² − n·μ²)/(n−1) then runs as a
    * short chain of double ops on those identical exact operands (a
    * decimal-product identity was rejected: Spark caps decimal(38)
    * products by REDUCING SCALE — silent rounding DuckDB doesn't do).
    * One scan, one group-sized aggregate, group²-sized pair join.
    */
  def welchPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("decimal(18,4)")
    val g = df.filter(v.isNotNull && col(groupCol).isNotNull)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n"),
        sum(v).as("sx"),
        sum(v * v).as("sxx"))
      .filter(col("n") >= 2)
    val a = g.select(col(groupCol).as("g1"), col("n").as("n1"),
      col("sx").as("sx1"), col("sxx").as("sxx1"))
    val b = g.select(col(groupCol).as("g2"), col("n").as("n2"),
      col("sx").as("sx2"), col("sxx").as("sxx2"))
    def mean(sx: String, n: String) =
      col(sx).cast("double") / col(n).cast("double")
    def variance(sxx: String, sx: String, n: String) = {
      val nd = col(n).cast("double")
      val m = col(sx).cast("double") / nd
      (col(sxx).cast("double") - nd * m * m) / (nd - lit(1.0))
    }
    val v1 = variance("sxx1", "sx1", "n1")
    val v2 = variance("sxx2", "sx2", "n2")
    val se1 = v1 / col("n1").cast("double")
    val se2 = v2 / col("n2").cast("double")
    val se = se1 + se2
    a.crossJoin(broadcast(b)).filter(col("g1") < col("g2"))
      .select(
        col("g1"), col("g2"), col("n1"), col("n2"),
        mean("sx1", "n1").as("mean1"),
        mean("sx2", "n2").as("mean2"),
        when(se > 0,
          (mean("sx1", "n1") - mean("sx2", "n2")) / sqrt(se))
          .otherwise(lit(null).cast("double")).as("t_stat"),
        // Welch–Satterthwaite effective degrees of freedom
        when(se > 0,
          (se * se) / (se1 * se1 / (col("n1").cast("double") - lit(1.0)) +
            se2 * se2 / (col("n2").cast("double") - lit(1.0))))
          .otherwise(lit(null).cast("double")).as("dof"))
  }

  /** Two-proportion z-test between two arms of a subject-level binary
    * outcome: pooled-variance z plus each arm's 95% Wilson score
    * interval (the CI that behaves at small n and extreme p, unlike the
    * Wald interval). `armCol` is any 2-valued column; arms are ordered
    * lexically (z > 0 ⇔ first arm converts better). Counts are exact
    * longs; the dozen float ops run on identical operands anywhere.
    */
  def twoProportionZ(subjects: DataFrame, armCol: String,
                     convertedCol: String): DataFrame = {
    val arms = subjects
      .filter(col(armCol).isNotNull)
      .groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col(convertedCol).cast("long")).as("conv"))
    val z196 = lit(1.959963984540054) // Φ⁻¹(0.975), exact double literal
    def wilson(n: org.apache.spark.sql.Column, p: org.apache.spark.sql.Column,
               sign: Double) = {
      val z2 = z196 * z196
      val center = p + z2 / (lit(2.0) * n)
      val spread = z196 * sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n))
      (center + lit(sign) * spread) / (lit(1.0) + z2 / n)
    }
    val withP = arms.withColumn("p",
      col("conv").cast("double") / col("n").cast("double"))
    val a = withP.select(col("arm").as("arm1"), col("n").as("n1"),
      col("conv").as("conv1"), col("p").as("p1"))
    val b = withP.select(col("arm").as("arm2"), col("n").as("n2"),
      col("conv").as("conv2"), col("p").as("p2"))
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val pPool = (col("conv1") + col("conv2")).cast("double") / (n1d + n2d)
    val sePool = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / n1d + lit(1.0) / n2d))
    a.crossJoin(broadcast(b)).filter(col("arm1") < col("arm2"))
      .select(
        col("arm1"), col("arm2"), col("n1"), col("conv1"),
        col("n2"), col("conv2"), col("p1"), col("p2"),
        when(sePool > 0, (col("p1") - col("p2")) / sePool)
          .otherwise(lit(null).cast("double")).as("z_stat"),
        wilson(n1d, col("p1"), -1.0).as("p1_lo"),
        wilson(n1d, col("p1"), 1.0).as("p1_hi"),
        wilson(n2d, col("p2"), -1.0).as("p2_lo"),
        wilson(n2d, col("p2"), 1.0).as("p2_hi"))
  }
}
