package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

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
    * stream's column pruning applied — the shared delegation recipe
    * ([[GraftDelegatedScan]]).
    */
  private def parquetScanOf(dirs: Seq[String], atVersion: Option[Long]): Scan = {
    val spark = SparkSession.active
    val fileSchema = atVersion.flatMap(vt.physSchemaAt).getOrElse(logicalSchema)
    GraftDelegatedScan.build(spark, fileSchema,
      dirs.map(d => new Path(new Path(vt.root), d)), required,
      pushdown = None)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = ver(start)
    val e = ver(end)
    if (e < 0 || e <= s) return Array.empty
    val dirs: Seq[String] =
      if (s < 0) {
        // anchor snapshot: merge-on-read deletes or a mapping overlay may
        // have landed between table resolution (where the capability was
        // checked) and the first trigger — a raw parquet read would then
        // resurrect deleted rows / stale names
        val m = vt.manifestOf(e)
        if (m.dvs.nonEmpty || m.colMap.nonEmpty)
          throw new IllegalStateException(
            s"streaming table read requires append-shaped history; the anchor " +
              s"snapshot v$e of ${vt.root} carries deletion vectors or a column " +
              "mapping — use spark.readStream.format(\"graft\")" +
              ".option(\"keyCols\", ...) for the keyed change-data-feed stream")
        m.dataDirs
      } else {
        val vs = vt.versions.filter(v => v > s && v <= e)
        // the end offset was a live version when the trigger planned it:
        // an empty window here means retention dropped the manifests —
        // fail rather than silently commit a data-losing empty batch
        if (vs.isEmpty) throw new IllegalStateException(
          s"versions ($s, $e] of ${vt.root} are gone (vacuumed?); " +
            "cannot replay this micro-batch")
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
    else parquetScanOf(dirs, Some(e)).toBatch.planInputPartitions()
  }

  /** One stream-level factory, built ONCE per query run from an
    * empty-file-set template scan: parquet partition readers are
    * configured by schema/options, not by file set, so no per-trigger
    * (let alone per-table) listing is paid here.
    */
  private lazy val readerFactory: PartitionReaderFactory =
    parquetScanOf(Nil, None).toBatch.createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def toString: String = s"GraftMicroBatchStream[${vt.root}]"
}
