package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sum over a GLOBAL long-keyed order — the scalable
  * replacement for `sum(x) OVER (ORDER BY t)`, whose single-partition
  * window stage is the classic cumsum scale-killer. Execution is the
  * two-phase prefix sum (the [[Sampling.packShards]] pattern, range-keyed
  * here because the order column carries meaning): range-bucket rows by
  * `orderCol` with integer-division widths (no overflow for any epoch
  * span), aggregate per-bucket value sums (≤ `buckets` rows, collected),
  * prefix the bucket offsets on the driver, then window-cumsum WITHIN
  * each bucket and add its offset. Same rows out as the one-window plan
  * any SQL engine replays.
  *
  * Contract: `orderCol` values must be DISTINCT (pre-aggregate ties —
  * a running sum at a duplicated key has no engine-stable definition) and
  * `valueCol` long (exact). The input is traversed twice (bucket sums +
  * final pass) — checkpoint upstream frames that are expensive to
  * recompute.
  */
object PrefixSum {

  def overOrdered(df: DataFrame, orderCol: String, valueCol: String,
                  buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val t = col(orderCol)
    val bounds = df.agg(min(t).as("_lo"), max(t).as("_hi"))
    // integer-division width: ceil-ish so b lands in [0, buckets]; never
    // multiplies the span, so any (lo, hi) pair of longs is overflow-safe
    val withB = df.crossJoin(broadcast(bounds))
      // `div`, not `/`: Spark's / is double division, which at epoch
      // magnitudes rounds the width — div keeps the whole layout integral
      .withColumn("__ps_w", expr(s"((_hi - _lo) div $buckets) + 1"))
      .withColumn("__ps_b",
        expr(s"((`$orderCol` - _lo) div __ps_w)").cast("int"))
    val per = withB.groupBy("__ps_b")
      .agg(sum(col(valueCol)).as("__ps_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val maxB = if (per.isEmpty) 0 else per.keys.max
    val offsets = (0 to maxB).scanLeft(0L)((acc, i) => acc + per.getOrElse(i, 0L))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = (0 to maxB).map(i => (i, offsets(i))).toDF("__ps_b", "__ps_off")
    val w = Window.partitionBy("__ps_b").orderBy(t)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(offDf), Seq("__ps_b"))
      .withColumn("cum", sum(col(valueCol)).over(w) + col("__ps_off"))
      .drop("__ps_b", "__ps_w", "__ps_off", "_lo", "_hi")
  }
}
