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
    // the window rule (anchor / structural append-shape / loud vacuum)
    // is shared with the composed partitioned stream —
    // [[VersionedTable.streamWindowDirs]] — so the two surfaces cannot
    // drift
    val dirs = vt.streamWindowDirs(s, e)
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
