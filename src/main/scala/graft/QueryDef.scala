package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** One declared engine query: a Spark build function plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle run by the driver on
  * the same parquet tables.
  *
  * `headline` marks the queries Bench times at sf0.1.
  *
  * `selfGated` marks the (few) queries that deliberately carry NO oracle
  * because their core is a randomized/implementation-defined sketch with no
  * SQL replay (HLL++/KLL/DataSketches internals); each one has an oracled
  * deterministic twin plus an in-build self-gate that hard-fails the query
  * when the estimate leaves its documented error bracket. Verify emits the
  * set as `self_gated.json` so correctness readers see "by design" in the
  * artifact itself.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    selfGated: Boolean = false)

object QueryDef {

  /** Round every floating-point column to 6 decimals — applied identically on
    * the Spark side and (via `round(x, 6)`) in the oracle SQL, so sub-ulp
    * differences from summation order can never flip a hash compare.
    */
  def round6(df: DataFrame): DataFrame = df.select(df.schema.fields.map { f =>
    f.dataType match {
      case DoubleType => round(col(f.name), 6).as(f.name)
      case FloatType  => round(col(f.name).cast("double"), 6).as(f.name)
      case _          => col(f.name)
    }
  }.toSeq: _*)
}
