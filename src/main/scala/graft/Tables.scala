package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver's synthetic test tables (TESTDATA.md).
  *
  * Each table is a single parquet file at `<sfDir>/<name>.parquet`. The
  * loaders stay schema-on-file (parquet footers carry the schema); callers
  * select the columns they need so Catalyst prunes the scan down to exactly
  * those columns (`ReadSchema` in the formatted plan).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** `ts` has shipped as parquet TIMESTAMP(NANOS) (unsupported by Spark's
    * vectorized reader — sessions set `spark.sql.legacy.parquet.nanosAsLong`
    * and the loader truncates nanos → micros exactly like DuckDB/pandas;
    * integer `div` keeps full precision where a double roundtrip would
    * corrupt ~1.7e18) and as TIMESTAMP(MICROS) without isAdjustedToUTC,
    * which Spark surfaces as TIMESTAMP_NTZ. Downstream operators and specs
    * assume session-zoned TimestampType (`unix_micros`, double casts), so
    * both shapes normalize here; the session is pinned UTC (GraftSession),
    * making the NTZ cast a micros-identity relabel, not a conversion.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // runtime-settable; makes the loader work under driver-owned sessions
    // that lack GraftSession's config
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _        => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
