package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType, TimestampNTZType, TimestampType}

/** One-pass column profiler — the data-quality summary every pipeline run
  * should publish (null rates, cardinality, value ranges), shaped like
  * `DESCRIBE EXTENDED`/Deequ's profile but computed as ONE aggregate over
  * the table: a single scan, a single (partial-aggregated) shuffle, however
  * many columns are profiled. Per-column jobs would scan the table k times.
  *
  * min/max are computed on the NATIVE type (so ordering is the column's
  * own, not lexicographic) and only then rendered to strings with
  * engine-stable formats: integrals/strings verbatim, floats via
  * DECIMAL(24,6) (fixed scale prints identically everywhere), timestamps
  * as `yyyy-MM-dd HH:mm:ss` UTC. distinct counts are exact; swap
  * `approx_count_distinct` in at the 100 TB grain where a 2% error is an
  * acceptable trade for skipping the distinct expansion.
  */
object Profile {

  private def render(df: DataFrame, c: String)(v: Column): Column =
    df.schema(c).dataType match {
      case DoubleType | FloatType =>
        round(v.cast("double"), 6).cast("decimal(24,6)").cast("string")
      case TimestampType => date_format(v, "yyyy-MM-dd HH:mm:ss")
      case TimestampNTZType =>
        date_format(v.cast("timestamp"), "yyyy-MM-dd HH:mm:ss")
      case _ => v.cast("string")
    }

  /** Profile `cols` (default: every column) of `df`: one row per column
    * with (column, n_rows, n_nulls, n_distinct, min_value, max_value).
    *
    * `exactDistinct = true` (the oracle-parity mode) computes exact
    * distinct counts — Spark plans k distinct aggregates as a k-way Expand
    * of the input, so the shuffle carries k× the rows; fine at audit
    * scale, the wrong trade at 100 TB. `exactDistinct = false` is the
    * scale mode: `approx_count_distinct` (HyperLogLog++, ~2% error) keeps
    * the single-pass single-shuffle shape with NO Expand — profile cost
    * becomes one ordinary aggregate regardless of column count.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              exactDistinct: Boolean = true): DataFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    val aggs = count(lit(1)).as("__n") +: target.flatMap { c =>
      val r = render(df, c) _
      // rsd 0.02: tighter than the 0.05 default — the sketch is still a
      // few KB per column, and profile consumers read these as real counts
      val nd = if (exactDistinct) count_distinct(col(c))
        else approx_count_distinct(col(c), 0.02)
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        nd.as(s"__nd_$c"),
        r(min(col(c))).as(s"__mn_$c"),
        r(max(col(c))).as(s"__mx_$c"))
    }
    // 1 aggregated row → k output rows: the explode runs over a single row,
    // so the "pivot" costs nothing and stays fully declarative
    df.agg(aggs.head, aggs.tail: _*).select(explode(array(target.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value"))
    }: _*)).as("p")).select("p.*")
  }
}
