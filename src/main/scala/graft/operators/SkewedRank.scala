package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact `row_number() OVER (PARTITION BY p ORDER BY k)` with SKEW-SAFE
  * execution — the X18 two-phase discipline applied to per-group ranking.
  *
  * The naive window puts EVERY row of a partition key in one task; at web
  * scale a single hot domain can be 10% of the corpus, so the per-domain
  * rank (the C4 domain cap's core) would funnel 10 TB through one
  * executor. Instead:
  *
  *   1. range-bucket rows by the ORDER key with integer-division widths
  *      (the [[PrefixSum]] layout — overflow-safe for any long span). A
  *      hot group's rows spread across all the buckets its keys span, so
  *      no task ever holds more than ~1/buckets of it.
  *   2. per-(group, bucket) counts — an aggregate frame whose WINDOW
  *      partitions are ≤ `buckets` rows per group (bounded by
  *      construction, never data-sized) — prefix-summed into per-bucket
  *      rank offsets.
  *   3. rank WITHIN each (group, bucket) — again ~1/buckets of the hot
  *      group per task — plus the bucket's offset = the exact global
  *      rank, because bucket ascending is order-key ascending.
  *
  * Every stage is a hash aggregate, a bounded window, or an equi-join
  * (null-safe on the group key: a null group still ranks, exactly as the
  * one-window plan and every SQL engine would). Same rows out as
  * `row_number()` — oracles replay the naive spelling verbatim.
  *
  * Contract: `orderCol` is numeric (long-castable) and UNIQUE within each
  * group — row_number at duplicate keys has no engine-stable order. The
  * input is traversed twice (counts + final rank); checkpoint upstream
  * frames that are expensive to recompute.
  */
object SkewedRank {

  def rowNumber(df: DataFrame, partCol: String, orderCol: String,
                rankCol: String = "rk", buckets: Int = 1024): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val t = col(orderCol)
    val bounds = df.agg(min(t).cast("long").as("__sr_lo"),
      max(t).cast("long").as("__sr_hi"))
    val withB = df.crossJoin(broadcast(bounds))
      // div, not /: double division rounds at epoch/id magnitudes
      .withColumn("__sr_w",
        expr(s"((__sr_hi - __sr_lo) div $buckets) + 1"))
      .withColumn("__sr_b",
        expr(s"((CAST(`$orderCol` AS BIGINT) - __sr_lo) div __sr_w)")
          .cast("int"))
      .drop("__sr_lo", "__sr_hi", "__sr_w")
    val cnt = withB.groupBy(col(partCol), col("__sr_b"))
      .agg(count(lit(1)).as("__sr_n"))
    // per-group running offset over the BOUNDED (≤ buckets rows/group)
    // count frame — this window is the only per-group-global stage and
    // its partitions can never exceed `buckets` rows
    val wOff = Window.partitionBy(col(partCol)).orderBy(col("__sr_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off = cnt
      .withColumn("__sr_off", sum(col("__sr_n")).over(wOff) - col("__sr_n"))
      .select(col(partCol).as("__sr_p"), col("__sr_b").as("__sr_b2"),
        col("__sr_off"))
    val wLoc = Window.partitionBy(col(partCol), col("__sr_b")).orderBy(t)
    withB
      .join(off, col(partCol) <=> col("__sr_p") &&
        col("__sr_b") === col("__sr_b2"))
      .withColumn(rankCol,
        (row_number().over(wLoc) + col("__sr_off")).cast("long"))
      .drop("__sr_b", "__sr_b2", "__sr_p", "__sr_off")
  }
}
