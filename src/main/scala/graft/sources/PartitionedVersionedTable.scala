package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned MERGE over [[VersionedTable]]s: one transaction log per
  * partition value (`<root>/<col>=<value>/_txlog/…`), so an upsert only
  * rewrites partitions that actually contain matched keys — the discipline
  * that makes copy-on-write MERGE affordable at 100 TB (an unpartitioned
  * MERGE rewrites the world; a date/repo-partitioned one rewrites a few
  * shards). Same layout convention as Hive-style partitioning, so external
  * tools can still list it.
  *
  * Each partition commits independently (its own optimistic-concurrency
  * log). Cross-partition atomicity is NOT provided — the same trade Delta
  * users accept when they MERGE with a partition predicate; a reader
  * doing `read()` across partitions sees each partition's latest committed
  * snapshot.
  *
  * The partition column must be stable for a given key (an issue's repo, a
  * doc's source) — if a key's partition value could change, the old row
  * would survive in its old partition (same caveat as any partitioned
  * upsert store).
  */
final class PartitionedVersionedTable(spark: SparkSession, root: String,
                                      partitionCol: String) {

  private def partRoot(value: String): String =
    s"$root/$partitionCol=$value"

  /** The per-partition table (exposed for snapshot/time-travel access). */
  def partition(value: String): VersionedTable =
    VersionedTable(spark, partRoot(value))

  /** Partition values present on disk. */
  def partitions: Seq[String] = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(s"$partitionCol="))
      .map(_.stripPrefix(s"$partitionCol=")).toSeq.sorted
  }

  /** Directory-safe partition values only: null or path-meaningful
    * characters would corrupt the `<col>=<value>` layout (Hive escapes
    * these; we reject them — partition columns are engine-chosen, bounded
    * vocabularies like repo/month/source).
    */
  private def validate(v: String): String = {
    require(v != null, s"null $partitionCol partition value")
    require(v.matches("[A-Za-z0-9._-]+"),
      s"unsafe $partitionCol partition value '$v' (allowed: [A-Za-z0-9._-])")
    v
  }

  private def values(df: DataFrame): Seq[String] =
    df.select(col(partitionCol).cast("string")).distinct()
      .collect().map(r => validate(r.getString(0))).toSeq.sorted

  /** Overwrite the partitions present in `df` (dynamic-partition
    * overwrite); untouched partitions keep their data and history.
    * The frame is materialized once — the per-partition slices and the
    * values() probe must not re-run an expensive lineage per partition.
    */
  def overwrite(df: DataFrame): Unit = {
    val mat = df.localCheckpoint(true)
    values(mat).foreach { v =>
      partition(v).overwrite(mat.filter(col(partitionCol).cast("string") === v))
    }
  }

  /** MERGE `updates` into ONLY the partitions it touches; every other
    * partition's log is not even opened. The per-partition update sets are
    * disjoint slices of ONE materialized frame — the driver loop is over
    * partition VALUES (bounded by design: repo, month, source), not rows.
    */
  def merge(updates: DataFrame, keyCols: Seq[String], orderCol: String): Unit = {
    val mat = updates.localCheckpoint(true)
    values(mat).foreach { v =>
      partition(v).merge(mat.filter(col(partitionCol).cast("string") === v),
        keyCols, orderCol)
    }
  }

  /** Union of every partition's latest snapshot. */
  def read(): DataFrame = {
    val parts = partitions
    require(parts.nonEmpty, s"no partitions at $root")
    parts.map(v => partition(v).read()).reduce(_ unionByName _)
  }
}

object PartitionedVersionedTable {
  def apply(spark: SparkSession, root: String,
            partitionCol: String): PartitionedVersionedTable =
    new PartitionedVersionedTable(spark, root, partitionCol)
}
