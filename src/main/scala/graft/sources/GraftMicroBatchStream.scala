package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 micro-batch stream over a governed table —
  * `spark.readStream.table("cat.t")`: offsets are COMMIT VERSIONS from the
  * transaction log; each trigger reads exactly the data dirs the commits
  * in `(start, end]` ADDED, planned straight as vectorized parquet
  * partitions (no driver-side row materialization — executors read the
  * new files like any batch scan would).
  *
  * Semantics (the Delta streaming-table contract): the first batch is the
  * anchor snapshot; every later batch requires the covered commits to be
  * APPEND-shaped — verified STRUCTURALLY (no data dir removed, no new
  * deletion vectors, mapping unchanged), not by operation name, so any
  * future append-shaped operation streams and any rewrite
  * (DELETE/UPDATE/MERGE/OPTIMIZE) fails with a pointer to the CDF stream
  * (`readStream.format("graft")` + `keyCols`), which handles arbitrary
  * changes as keyed diffs. Offset math is deterministic from the log, so
  * checkpoint recovery replans identical batches as long as versions are
  * not vacuumed.
  */
final class GraftMicroBatchStream(vt: VersionedTable,
                                  logicalSchema: StructType,
                                  required: StructType)
    extends MicroBatchStream {

  private case class VOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = VOffset(-1L)

  override def latestOffset(): Offset =
    VOffset(vt.latestVersion.getOrElse(-1L))

  override def deserializeOffset(json: String): Offset = VOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  private def ver(o: Offset): Long = o match {
    case VOffset(v) => v
    case other => other.json().toLong
  }

  /** Parquet scan over `dirs` (relative to the table root), with the
    * stream's column pruning applied — the same delegation recipe as the
    * batch path ([[GraftRuntimeScan]]).
    */
  private def parquetScanOf(dirs: Seq[String], atVersion: Long): Scan = {
    val spark = SparkSession.active
    val fileSchema = vt.physSchemaAt(atVersion).getOrElse(logicalSchema)
    val paths = dirs.map(d => new Path(new Path(vt.root), d))
    val index = new InMemoryFileIndex(spark, paths,
      Map.empty[String, String], Some(fileSchema),
      FileStatusCache.getOrCreate(spark), Some(PartitionSpec.emptySpec))
    val sb = ParquetScanBuilder(spark, index, fileSchema, fileSchema,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    sb.pruneColumns(required)
    sb.build()
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = ver(start)
    val e = ver(end)
    if (e < 0 || e <= s) return Array.empty
    val dirs: Seq[String] =
      if (s < 0) vt.manifestOf(e).dataDirs // anchor snapshot
      else {
        val vs = vt.versions.filter(v => v > s && v <= e)
        vs.flatMap { v =>
          val prev = vt.manifestOf(v - 1)
          val cur = vt.manifestOf(v)
          val removed = prev.dataDirs.filterNot(cur.dataDirs.contains)
          val newDvs = cur.dvs.filterNot(prev.dvs.contains)
          if (removed.nonEmpty || newDvs.nonEmpty || cur.colMap != prev.colMap)
            throw new IllegalStateException(
              s"streaming table read requires append-shaped commits; version $v " +
                s"(${cur.operation}) rewrites data — use " +
                "spark.readStream.format(\"graft\").option(\"keyCols\", ...) " +
                "for the keyed change-data-feed stream instead")
          cur.dataDirs.filterNot(prev.dataDirs.contains)
        }
      }
    if (dirs.isEmpty) Array.empty
    else parquetScanOf(dirs, e).toBatch.planInputPartitions()
  }

  /** One stream-level factory: parquet partition readers are configured
    * by schema/options, not by file set, so the factory from a template
    * scan reads every batch's partitions.
    */
  override def createReaderFactory(): PartitionReaderFactory = {
    val anchor = vt.latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at ${vt.root}"))
    parquetScanOf(vt.manifestOf(anchor).dataDirs, anchor)
      .toBatch.createReaderFactory()
  }

  override def toString: String = s"GraftMicroBatchStream[${vt.root}]"
}
