package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Banded range join: all (left, right) pairs with
  * `|left.ts - right.ts| <= delta` (plus optional equi-keys) WITHOUT a
  * cross product — the interval-join primitive open-source Spark lacks
  * (Flink's interval join; Databricks' range-join optimization).
  *
  * Strategy: bucket both sides into bins of width `delta`
  * (`bin = floor(epoch / delta)`); a qualifying pair's bins differ by at
  * most 1, so the LEFT side explodes to bins {b-1, b, b+1} and equi-joins
  * the right side's single bin, then the exact predicate filters the
  * band. Each true pair is emitted exactly once (the right row owns one
  * bin; the left copies carry distinct bins). Candidate space is bounded
  * by bin co-occupancy — shuffle is a plain hash exchange on
  * (keys…, bin), 3× the left side's rows, never n².
  *
  * Skew: a hot bin (burst of events in one delta window) concentrates in
  * one reducer like any hot key; AQE skew-join splitting applies because
  * this IS an equi-join.
  */
object RangeJoin {

  /** Pairs within `deltaSeconds`, equi-matched on `keyCols`. Left columns
    * keep their names; right columns are prefixed `r_`. `tsCol` may be a
    * TIMESTAMP/TIMESTAMP_NTZ (band math in exact integer micros — a double
    * carries ~0.2µs representation error at epoch magnitude, enough to flip
    * a pair sitting exactly on the <= boundary) or any numeric
    * seconds-since-epoch column (band math in the column's own double
    * semantics, so results agree bit-for-bit with a brute-force
    * `abs(l.ts - r.ts) <= delta` predicate over the same values). Both
    * sides must use the same representation.
    */
  def byTimestamp(left: DataFrame, right: DataFrame, tsCol: String,
                  deltaSeconds: Long,
                  keyCols: Seq[String] = Nil): DataFrame = {
    require(deltaSeconds > 0, "deltaSeconds must be positive")
    require(deltaSeconds <= Long.MaxValue / 1000000L,
      s"deltaSeconds=$deltaSeconds overflows Long microseconds")
    val isTimestamp = left.schema(tsCol).dataType match {
      case TimestampType | TimestampNTZType => true
      case _                                => false
    }
    // ticks = the comparable time value; band = delta in the same unit.
    // TIMESTAMP → exact integer micros; binning divides through decimal so
    // the quotient is exact too (a boundary value must land in the same bin
    // on both sides). Numeric → plain double seconds, matching the
    // predicate a user would write directly over the same column.
    val (ticks, band): (Column => Column, Column) =
      if (isTimestamp)
        ((c: Column) => unix_micros(c.cast("timestamp")),
          lit(deltaSeconds * 1000000L))
      else ((c: Column) => c.cast("double"), lit(deltaSeconds.toDouble))
    def bin(c: Column): Column =
      if (isTimestamp)
        floor(ticks(c).cast("decimal(38,0)") / band).cast("long")
      else floor(ticks(c) / band).cast("long")
    val l = left.withColumn("_bin0", bin(col(tsCol)))
      .withColumn("_bin",
        explode(array(col("_bin0") - 1, col("_bin0"), col("_bin0") + 1)))
      .drop("_bin0")
    val r = right.columns.foldLeft(right)((df, c) =>
        df.withColumnRenamed(c, s"r_$c"))
      .withColumn("_bin", bin(col(s"r_$tsCol")))
    val cond = (keyCols.map(k => l(k) === r(s"r_$k")) :+
      (l("_bin") === r("_bin"))).reduce(_ && _)
    l.join(r, cond)
      .filter(abs(ticks(col(tsCol)) - ticks(col(s"r_$tsCol"))) <= band)
      .drop("_bin")
  }
}
