package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the points no other point beats on both
  * axes — minimize `x`, maximize `y`, strict in at least one. The
  * exploration primitive behind "cheapest order that still ships the most
  * items", "smallest doc with the highest quality score", etc.
  *
  * The textbook single-window sweep (sort by x asc, y desc, keep rows
  * whose y exceeds the running max) is correct but serializes the whole
  * input through ONE partition — the classic global-window scale trap.
  * This implementation keeps the sweep but shards it:
  *
  *  1. distinct (x, y) — one hash agg (identical points can't dominate
  *     each other; dedup also makes the tie logic exact, see below);
  *  2. range-bucket on x via bounded `approxQuantile` boundaries (a
  *     driver list of ≤ nBuckets doubles; value-based, so equal x always
  *     lands in one bucket). The OUTPUT is bucketing-independent — any
  *     boundary skew only unbalances work, never changes the answer;
  *  3. the sweep window runs PER BUCKET, in parallel;
  *  4. cross-bucket domination collapses to a prefix-max: a point in an
  *     earlier bucket has strictly smaller x (value-based bucketing), so
  *     it dominates iff its y ≥ this point's y — and the per-bucket max y
  *     of local survivors equals the bucket's true max y (the max-y point
  *     always survives its local sweep). One nBuckets-row window + one
  *     broadcast join finishes the job.
  *
  * Total cost: one shuffle (distinct), one quantile pass, one
  * partition-local sort per bucket, one tiny broadcast — no global sort,
  * no quadratic anti-join.
  *
  * Tie exactness (post-distinct): within a bucket, an equal-y predecessor
  * in (x asc, y desc) order has strictly smaller x and correctly kills
  * the row (`y > pmax` fails at equality); across buckets the same
  * strictness lives in `y > prefix`.
  */
object Pareto {

  /** Frontier of `points` minimizing `xCol`, maximizing `yCol`; null
    * coordinates are dropped (they compare with nothing). Returns distinct
    * frontier points as (x, y) doubles.
    */
  def frontier2d(points: DataFrame, xCol: String, yCol: String,
                 nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val pts = points
      .select(col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .distinct()
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = if (probs.isEmpty) Array.empty[Double]
      else pts.stat.approxQuantile("x", probs, 0.01)
    val bucket =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedLit(bounds.toSeq), b => col("x") > b))
    val sweep = Window.partitionBy("bucket")
      .orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pts.withColumn("bucket", bucket)
      .withColumn("pmax", max(col("y")).over(sweep))
      .filter(col("pmax").isNull || col("y") > col("pmax"))
    // nBuckets rows: the only cross-bucket structure is this tiny window
    val prefix = local.groupBy("bucket").agg(max(col("y")).as("bmax"))
      .withColumn("prefix", max(col("bmax")).over(
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("prefix"))
    local.join(broadcast(prefix), Seq("bucket"), "left")
      .filter(col("prefix").isNull || col("y") > col("prefix"))
      .select(col("x"), col("y"))
  }
}
