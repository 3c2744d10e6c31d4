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
  *   1. range-bucket rows by the ORDER key. Bucket assignment runs in
  *      DOUBLE space — `floor((k − lo) / width)` — because the long span
  *      `hi − lo` overflows for full-range 64-bit keys (hash/fingerprint
  *      ids); long→double is order-preserving and fp subtraction/division
  *      by a positive constant are monotone NON-DECREASING, so a bucket
  *      can only ever merge adjacent keys, never reorder them — which is
  *      all correctness needs (ranks are computed exactly within buckets;
  *      rounding just shifts where the bucket boundaries fall). A hot
  *      group's rows spread across all the buckets its keys span, so no
  *      task ever holds more than ~1/buckets of it.
  *   2. per-(group, bucket) counts — an aggregate frame whose WINDOW
  *      partitions are ≤ `buckets` rows per group (bounded by
  *      construction, never data-sized) — prefix-summed into per-bucket
  *      rank offsets.
  *   3. rank WITHIN each (group, bucket), ordered by the ORIGINAL key
  *      (exact, not the double image), plus the bucket's offset = the
  *      exact global rank, because bucket ascending is key ascending.
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
  * internally ([[SharedPass]] policy) — the three passes (bounds,
  * counts, final rank) must not recompute an expensive upstream
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

  def rowNumber(df: DataFrame, partCol: String, orderCol: String,
                rankCol: String = "rk", buckets: Int = 1024): DataFrame = {
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
    val image: org.apache.spark.sql.Column = dt match {
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
    val in = SharedPass.materialize(df)
    val t = col(orderCol)
    // loud contract: a null key would otherwise silently drop through
    // the bucket equi-join instead of ranking nulls-first like a window
    val kd = when(t.isNull,
      raise_error(lit(s"SkewedRank: null $orderCol order key")))
      .otherwise(image)
    val bounds = in.agg(min(kd).as("__sr_lo"), max(kd).as("__sr_hi"))
    val withB = in.crossJoin(broadcast(bounds))
      // double-space width: overflow-safe for any long span; floored at
      // 1 ulp-free unit so a single-key frame divides by a positive width
      .withColumn("__sr_w",
        greatest((col("__sr_hi") - col("__sr_lo")) / buckets, lit(1e-9)))
      .withColumn("__sr_b",
        least(floor((kd - col("__sr_lo")) / col("__sr_w")),
          lit(buckets.toLong)).cast("int"))
      .drop("__sr_lo", "__sr_hi", "__sr_w")
    val cnt = withB.groupBy(col(partCol), col("__sr_b"))
      .agg(count(lit(1)).as("__sr_n"))
    // per-group running offset over the BOUNDED (≤ buckets+1 rows/group)
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
      .drop("__sr_b", "__sr_b2", "__sr_p", "__sr_off")
  }
}
