package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** I/O layer: bronze run-file resolution, parquet+CSV table sinks, and the
  * snapshot-consolidation strategies.
  *
  * The reference dedups across ingest runs by reading only the newest full
  * snapshot (lexicographic max of `issues_*.jsonl`, reference
  * `silver.py:12-17`); [[latestRun]] reproduces that. [[mergeRuns]] is the
  * scale-mode alternative: union all runs and keep the latest version of each
  * issue — the lakehouse MERGE idiom, which is what you'd run on a cluster
  * where re-downloading a full snapshot is not an option.
  */
object Lakehouse {

  /** Lexicographic max of `issues_*.jsonl` in a bronze dir
    * (reference `silver.py:12-17`).
    */
  def latestRun(spark: SparkSession, bronzeDir: String): String = {
    val path = new Path(bronzeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val runs = fs.listStatus(path).map(_.getPath)
      .filter { p => p.getName.startsWith("issues_") && p.getName.endsWith(".jsonl") }
      .map(_.toString).sorted
    require(runs.nonEmpty, s"No bronze files found in $bronzeDir")
    runs.last
  }

  /** Scale-mode consolidation: all runs unioned, one row per `id`, latest
    * `updated_at` wins; ties break on the source file name descending
    * (run files sort lexicographically by run id, so "latest run wins").
    * NOTE: the tie-break is deterministic only for FILE-BACKED input —
    * `input_file_name()` is "" for in-memory/cached frames, where equal
    * `updated_at` ties are unspecified. [[VersionedTable.merge]] is the
    * transactional, always-deterministic version of this idiom.
    */
  def mergeRuns(bronzeAllRuns: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id"))
      .orderBy(col("updated_at").desc_nulls_last, input_file_name().desc)
    bronzeAllRuns
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Bronze JSONL run-file sink (reference `ingest.py:92,121`): Spark's JSON
    * sink is JSON-Lines; one run = one directory stamped like the
    * reference's `issues_{run_id}.jsonl` naming.
    */
  def writeJsonlRun(df: DataFrame, bronzeDir: String, runId: String): String = {
    val path = s"$bronzeDir/issues_$runId.jsonl"
    df.write.mode("overwrite").json(path)
    path
  }

  /** Parquet (primary) + single-file headered CSV (export) sinks, mirroring
    * the reference's dual persistence (reference `silver.py:183-184`,
    * `gold.py:159-162`). CSV is an export/debug format: `coalesce(1)` is
    * deliberate and must never be applied to the parquet path at scale.
    */
  def writeTable(df: DataFrame, basePath: String): Unit = {
    // zstd: ~30% smaller than snappy at similar scan speed — at 100 TB the
    // scan is I/O-bound and the size delta is the dominant cost lever
    df.write.mode("overwrite").option("compression", "zstd")
      .parquet(s"$basePath.parquet")
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(s"$basePath.csv")
  }

  /** Bucketed managed table: pre-shuffles rows into `n` buckets on the join
    * key at WRITE time, so equi-joins/aggregations between tables bucketed
    * on the same key at the same count plan with NO exchange — the
    * co-located-join layout for repeated fact-fact joins at scale.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
                    bucketCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // an in-memory catalog forgets tables across JVMs but their warehouse
    // dirs survive — saveAsTable then refuses the name with
    // LOCATION_ALREADY_EXISTS. Sweep the orphan location first so the
    // writer is idempotent across sessions (matches DROP TABLE semantics:
    // a managed table's data lives and dies with its catalog entry).
    val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"),
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Hive-style partitioned parquet table sink — the reference's
    * `{owner}__{repo}` path mangling (reference `ingest.py:70`) as a proper
    * partition column, giving partition pruning on read. At 100 TB this is
    * the primary table layout; pick partition columns with bounded
    * cardinality (repo, month) so file counts stay sane.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Parquet-with-CSV-fallback reader (reference `gold.py:41-49`). */
  def readTable(spark: SparkSession, basePath: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pq = new Path(s"$basePath.parquet")
    if (pq.getFileSystem(conf).exists(pq)) spark.read.parquet(pq.toString)
    else {
      val csv = new Path(s"$basePath.csv")
      require(csv.getFileSystem(conf).exists(csv), s"No table at $basePath")
      spark.read.option("header", "true").option("inferSchema", "true")
        .csv(csv.toString)
    }
  }

  /** Publish/export step (reference `scripts/export_pages_data.py:11-19` +
    * the single-file CSV fidelity note in SURVEY §7.4.6): copy the single
    * part file of a `coalesce(1)` CSV directory to a named destination
    * file.
    */
  def exportSingleCsv(spark: SparkSession, csvDir: String, destFile: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(csvDir)
    val fs = dir.getFileSystem(conf)
    val part = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".csv"))
    require(part.length == 1, s"expected exactly one part file in $csvDir")
    val dest = new Path(destFile)
    val destFs = dest.getFileSystem(conf)
    if (destFs.exists(dest)) destFs.delete(dest, false)
    org.apache.hadoop.fs.FileUtil.copy(fs, part.head, destFs, dest, false, conf)
  }

  /** Zero-egress stand-in for the GitHub labels endpoint (reference
    * `silver.py:20-38`): empty dimension, same schema. Used when no label
    * pages are available; [[labelDescriptions]] is the real path.
    */
  def emptyLabelDescriptions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("label", "description")
  }

  /** The labels dimension via the real page-number pagination loop
    * (reference `silver.py:20-38`) against a directory of pre-fetched
    * label pages (`page_N.jsonl`, one label object per line). The dim is
    * endpoint-sized (a repo has hundreds of labels, not millions), so it
    * collects on the driver and broadcasts into J1.
    */
  def labelDescriptions(spark: SparkSession, pagesDir: String,
                        perPage: Int = 100): DataFrame = {
    import spark.implicits._
    PaginatedIngest.fetchLabelDescriptions(
      PaginatedIngest.FilePageClient(pagesDir), perPage)
      .toDF("label", "description")
  }
}
