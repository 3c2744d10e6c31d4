package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistic in two passes — the scalable
  * replacement for "sort everything and take row k". Spark's exact
  * `percentile` buffers every value of the group in one aggregation
  * buffer, which for a GLOBAL percentile means the whole column on one
  * executor; this operator never holds more than one bucket:
  *
  *  pass 1: equi-width bucket counts ([[Histogram]] arithmetic, ≤
  *          `buckets` rows collected) — locates the bucket holding rank k
  *          and k's rank within it, plus n itself, in the same collect;
  *  pass 2: scan ONLY that bucket's rows, TakeOrdered(rankInBucket).
  *
  * The rank-k definition matches `quantile_disc`: k = ⌊(n−1)·q⌋ + 1
  * (1-based, lower order statistic — no interpolation, so the result is
  * a VALUE FROM THE DATA and exact across engines). Pathological skew
  * (one bucket holding nearly everything, e.g. a constant column) makes
  * pass 2 a big TakeOrdered; recurse the same trick inside the bucket if
  * that ever matters.
  */
object SelectK {

  /** Single row (n, kth) — the q-quantile as a lower order statistic. */
  def quantileDisc(df: DataFrame, valueCol: String, q: Double,
                   buckets: Int = 1024): DataFrame = {
    require(0.0 <= q && q <= 1.0, "need 0 <= q <= 1")
    val v = col(valueCol).cast("double")
    val rows = df.filter(v.isNotNull).select(v.as("_v"))
    val bounds = rows.agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi"))
    val width = (col("_hi") - col("_lo")) / buckets
    val bucket = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(floor((col("_v") - col("_lo")) / width),
        lit(buckets - 1L)).cast("long"))
    val withB = rows.crossJoin(broadcast(bounds)).withColumn("_b", bucket)
    val counts = withB.groupBy("_b").agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val spark = df.sparkSession
    import spark.implicits._
    if (n == 0) return Seq.empty[(Long, Double)].toDF("n", "kth")
    val k = math.floor((n - 1) * q).toLong + 1
    // walk buckets ascending until the cumulative count reaches k
    var cum = 0L
    var target = -1L
    for (b <- counts.keys.toSeq.sorted if target < 0) {
      if (cum + counts(b) >= k) target = b else cum += counts(b)
    }
    val rankInBucket = (k - cum).toInt
    val kth = withB.filter(col("_b") === target)
      .orderBy(col("_v")).limit(rankInBucket)
      .agg(max(col("_v")).as("kth"))
    kth.select(lit(n).as("n"), col("kth"))
  }
}
