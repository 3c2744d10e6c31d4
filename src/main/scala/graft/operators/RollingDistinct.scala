package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rolling distinct-entity count over a trailing window of time buckets —
  * "unique users in the trailing 24 h, reported hourly" (rolling DAU/WAU,
  * the product-analytics headline metric). Distinct counts don't fold, so
  * neither a windowed sum of per-bucket distincts (double-counts
  * returners) nor a stateful sliding window (holds every id in state)
  * gives this; the set-union semantics have to be materialized.
  *
  * Spark-first shape with NO window function and NO data-sized state:
  *   1. one hash agg → distinct (entity, bucket) — events collapse to at
  *      most |entities|×|buckets| rows;
  *   2. each pair EXPANDS to the k report buckets it's visible in
  *      (`sequence` + explode — a generator, k rows out per pair, map
  *      side);
  *   3. one hash agg → distinct (entity, report bucket) — an entity seen
  *      3× inside one trailing window still counts once;
  *   4. one count agg per report bucket.
  * Shuffles are keyed on (entity, bucket) — fully parallel at any scale;
  * the k-fold expansion is the honest output mass of the semantics (k =
  * window/step, e.g. 24), not overhead. Report buckets with no activity
  * in their whole trailing window are absent (no spine join here; counts
  * are exact integers so the oracle is replayable without float care).
  */
object RollingDistinct {

  /** Rows: (bucket_us, n_distinct) — bucket_us is the report bucket
    * start; its count covers (bucket_us − (k−1)·step, bucket_us], i.e.
    * the trailing k buckets including itself. Report buckets are clipped
    * to the data's own [min, max] bucket range so the tail never invents
    * future report rows.
    */
  def trailingDistinct(df: DataFrame, entityCol: String, tsCol: String,
                       stepMicros: Long, windowBuckets: Int): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    require(windowBuckets >= 1, "windowBuckets must be >= 1")
    val us = unix_micros(col(tsCol))
    val bucket = us - pmod(us, lit(stepMicros))
    // fan the projected (entity, ts) out of an under-parallel scan so the
    // first agg's map side (partial distinct of (entity, bucket) pairs —
    // the operator's dominant CPU+shuffle) parallelizes; no-op at scale
    // (guide §2.5, see ScanParallel)
    val pairs = ScanParallel.fanOut(
        df.filter(col(entityCol).isNotNull && col(tsCol).isNotNull)
          .select(col(entityCol).as("_e"), bucket.as("_b")),
        Seq(col("_e")))
      .groupBy("_e", "_b").agg(count(lit(1)).as("_drop")).drop("_drop")
      .localCheckpoint(true) // feeds the bounds probe AND the expansion
    val bounds = pairs.agg(min("_b").as("_lo"), max("_b").as("_hi"))
    pairs.crossJoin(broadcast(bounds))
      .select(col("_e"), explode(sequence(
        col("_b"),
        least(col("_b") + lit((windowBuckets - 1) * stepMicros), col("_hi")),
        lit(stepMicros))).as("bucket_us"))
      .groupBy("_e", "bucket_us").agg(count(lit(1)).as("_d")).drop("_d")
      .groupBy("bucket_us").agg(count(lit(1)).as("n_distinct"))
  }
}
