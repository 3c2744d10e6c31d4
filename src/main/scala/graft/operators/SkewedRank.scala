package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *   1. range-bucket rows by the ORDER key using EQUI-DEPTH bounds —
  *      interior quantiles of the key's monotone double image from one
  *      bounded `approxQuantile` pass (the [[Histogram.equiDepth]] /
  *      [[Pareto]] discipline). Depth-based bounds are the load-balance
  *      guarantee an equi-width `(k − lo)/width` image cannot give: a hot
  *      group whose keys CLUSTER inside a sliver of the global span (a
  *      burst crawl of one domain under sequential ingest ids) lands in
  *      one equi-width bucket and re-creates the single-task rank, while
  *      quantile bounds place ~1/buckets of all ROWS in every bucket, so
  *      the cluster spreads by construction. Bucket = count of bounds
  *      strictly below the image — a pure value expression (monotone
  *      non-decreasing in the key, ties never split), evaluated as a
  *      two-level chunked search (~2·√buckets comparisons/row against
  *      broadcast literal arrays, not a per-row linear scan).
  *   2. per-(group, bucket) counts — an aggregate frame whose WINDOW
  *      partitions are ≤ `buckets` rows per group (bounded by
  *      construction, never data-sized) — prefix-summed into per-bucket
  *      rank offsets.
  *   3. rank WITHIN each (group, bucket), ordered by the ORIGINAL key
  *      (exact, not the double image), plus the bucket's offset = the
  *      exact global rank, because bucket ascending is key ascending.
  *
  * The image is monotone NON-DECREASING by type (long→double is
  * order-preserving; strings/binary use a fixed-width byte-prefix
  * integer), so bucket boundaries can only merge adjacent keys, never
  * reorder them — all correctness needs, since ranks are exact within
  * buckets. Quantile approximation error only shifts WHERE the bounds
  * fall (load balance), never the rank arithmetic.
  *
  * Every stage is a hash aggregate, a bounded window, or an equi-join
  * (null-safe on the group key: a null group still ranks, exactly as the
  * one-window plan and every SQL engine would). Same rows out as
  * `row_number()` — oracles replay the naive spelling verbatim.
  *
  * Contract, ENFORCED loudly (never a silent row drop): `orderCol` must
  * be non-null (a null key raises at execution instead of vanishing
  * through the bucket join) and numeric, string, or binary — each gets a
  * type-appropriate monotone bucket image; anything else rejects at plan
  * time. Keys must be UNIQUE within each group (row_number at duplicate
  * keys has no engine-stable order). The input is materialized ONCE
  * internally ([[SharedPass]] policy) — the three passes (quantile
  * bounds, counts, final rank) must not recompute an expensive upstream
  * projection per pass.
  */
object SkewedRank {

  /** Whether [[rowNumber]] has a monotone bucket image for this order-key
    * type. Callers with type-agnostic public APIs route unsupported types
    * (dates, booleans, …) to the classic window instead of crashing a
    * previously valid call.
    */
  def supports(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.NumericType => true
    case org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.BinaryType => true
    case _ => false
  }

  /** The materialized input extended with `__sr_img` (the monotone double
    * image) and `__sr_b` (its equi-depth bucket) — the shared first phase
    * of [[rowNumber]], package-visible so specs can assert the bucket
    * DISTRIBUTION (no task holds more than ~1/buckets of a hot group)
    * without re-deriving the bounds.
    */
  private[graft] def bucketed(df: DataFrame, partCol: String,
                              orderCol: String, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // the bucket image must be MONOTONE in the column's own order, so it
    // is chosen by type at the schema (a digit-string column cast to
    // double would bucket numerically while the window orders it
    // lexicographically — the naive plan and this one would silently
    // disagree):
    //  - numeric: the double cast (order-preserving, non-strict)
    //  - string/binary: the first 7 bytes ZERO-PADDED to fixed width,
    //    read as an unsigned integer — fixed width is what keeps it
    //    monotone w.r.t. byte-lexicographic order (Spark compares UTF8
    //    bytes unsigned), since variable-length prefixes invert
    //    magnitudes ("ab" < "b" but int("ab") > int("b")); keys equal in
    //    their first 7 bytes merge into one bucket, which is always safe
    val dt = df.schema(orderCol).dataType
    val image: Column = dt match {
      case _: org.apache.spark.sql.types.NumericType =>
        col(orderCol).cast("double")
      case org.apache.spark.sql.types.StringType |
           org.apache.spark.sql.types.BinaryType =>
        expr(s"CAST(conv(hex(rpad(CAST(`$orderCol` AS BINARY), 7, X'00')), " +
          "16, 10) AS DOUBLE)")
      case other => throw new IllegalArgumentException(
        s"SkewedRank needs a numeric order column or a string/binary one; " +
          s"$orderCol is $other (use the plain window for other keys)")
    }
    val t = col(orderCol)
    // loud contract: a null key would otherwise rank nulls-first in the
    // quantile-bound image (approxQuantile skips nulls) while the naive
    // window ranks them too — neither silently; raise instead
    val kd = when(t.isNull,
      raise_error(lit(s"SkewedRank: null $orderCol order key")))
      .otherwise(image)
    val in = SharedPass.materialize(
      df.withColumn("__sr_img", kd.cast("double")))
    // EQUI-DEPTH bounds: the buckets−1 interior quantiles of the image,
    // one bounded-sketch driver action over the materialized frame; the
    // relative error is kept well under one bucket's depth so no bucket
    // silently doubles. Duplicate quantiles (heavy-hitter keys) collapse
    // — a value never splits across buckets, the correct semantics.
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else in.stat.approxQuantile("__sr_img",
        probs, math.min(0.001, 0.25 / buckets)).distinct.sorted
    val bucket: Column =
      if (bounds.isEmpty) lit(0)
      else {
        // two-level chunked count-of-bounds-below: coarse over the ≤
        // ⌈m/32⌉ chunk maxima, fine over ONE 32-wide slice — ~64
        // comparisons/row against broadcast literals instead of a linear
        // scan of all m bounds
        val m = bounds.length
        val chunk = 32
        val lasts = bounds.grouped(chunk).map(_.last).toSeq
        val img = col("__sr_img")
        def below(arr: Column) = aggregate(arr, lit(0),
          (acc, b) => acc + when(img > b, 1).otherwise(0))
        val coarse = below(typedLit(lasts))
        val fine = below(
          slice(typedLit(bounds.toSeq), coarse * chunk + 1, lit(chunk)))
        least(coarse * chunk, lit(m)) + fine
      }
    in.withColumn("__sr_b", bucket.cast("int"))
  }

  def rowNumber(df: DataFrame, partCol: String, orderCol: String,
                rankCol: String = "rk", buckets: Int = 1024): DataFrame = {
    val withB = bucketed(df, partCol, orderCol, buckets)
    val t = col(orderCol)
    val cnt = withB.groupBy(col(partCol), col("__sr_b"))
      .agg(count(lit(1)).as("__sr_n"))
    // per-group running offset over the BOUNDED (≤ buckets rows/group)
    // count frame — this window is the only per-group-global stage and
    // its partitions can never exceed the bucket count
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
      .drop("__sr_img", "__sr_b", "__sr_b2", "__sr_p", "__sr_off")
  }
}
