package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All declared queries, grouped by domain. */
  def all: Map[String, QueryDef] =
    PipelineQueries.defs ++ RelationalQueries.defs ++ EventQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MultimodalQueries.defs ++ CorpusQueries.defs ++ LakehouseQueries.defs ++
      BronzeJsonQueries.defs ++ SketchQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("pipe_gold_global").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, d) => k -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, d) if d.oracle.isDefined => k -> d.oracle.get }

  /** Headline queries timed by Bench at sf0.1. */
  def headlines: Map[String, (SparkSession, String) => DataFrame] =
    all.collect { case (k, d) if d.headline => k -> d.build }
}
