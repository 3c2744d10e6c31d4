package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOutputWriter, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType

/** One adopted part file (rows tracked so empty writers clean up). */
private[sources] final case class GraftFileMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** DSv2 STREAMING WRITE — `df.writeStream.toTable("cat.t")` (and the v2
  * route of `writeStream.format("graft")`): executor tasks write their
  * rows STRAIGHT to staged parquet files with Spark's own parquet write
  * support (vectorized row writing, zstd — no driver round-trip, no rows
  * on the wire), and the epoch commit adopts the staged files into one
  * data-dir commit via [[VersionedTable.adoptFiles]] (one columnar
  * readback builds the stats ledger, files MOVE — never copy).
  *
  * Physical order: Spark's v2 streaming write resolves columns by NAME
  * but does not physically reorder them, so the writer applies a
  * per-task unsafe projection into the COMMITTED column order before any
  * byte hits parquet — adopted dirs keep the table's physical-schema
  * invariant (every data dir written in committed order).
  *
  * Exactly-once: the SAME `stream_append:<queryId>:<epochId>` manifest
  * ledger as the V1 sink ([[GraftStreamSink]]) — an epoch already in the
  * log is a checkpoint-recovery replay and is skipped (its staging is
  * cleaned up). The log scan runs once per query run and is cached
  * driver-side afterward, like the V1 sink's. The two write paths
  * therefore share one idempotence discipline; a query can even switch
  * between them mid-life.
  */
final class GraftStreamingWrite(vt: VersionedTable, queryId: String,
                                querySchema: StructType,
                                mergeSchema: Boolean)
    extends StreamingWrite {

  private val opPrefix = "stream_append:"

  // highest epoch this query is known to have committed (ledger cache)
  private var lastEpoch: Option[Long] = None

  private def stagingDir(epochId: Long): Path =
    new Path(new Path(vt.root), s"_staging/$queryId/$epochId")

  /** Committed physical order for the staged files: the table's schema
    * order first (for the columns the query provides), appended columns
    * last (mergeSchema evolution); a brand-new table takes the query's
    * order. The projection from query order is computed here once.
    */
  private def targetOrder: Seq[String] = vt.tableSchema match {
    case Some(ts) =>
      val base = ts.fieldNames.toSeq.filter(querySchema.fieldNames.contains)
      base ++ querySchema.fieldNames.filterNot(base.contains)
    case None => querySchema.fieldNames.toSeq
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val order = targetOrder
    val writeSchema = StructType(order.map(n => querySchema(n)))
    val reorder: Option[Seq[Int]] =
      if (order == querySchema.fieldNames.toSeq) None
      else Some(order.map(querySchema.fieldIndex))
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    GraftStreamingWrite.configureParquet(conf, writeSchema)
    new GraftStreamWriterFactory(vt.root, queryId, querySchema, reorder,
      new SerializableWritable(conf))
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = stagingDir(epochId)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = messages.collect { case m: GraftFileMessage => m }
    def cleanup(): Unit = {
      if (fs.exists(stagingDir(epochId))) fs.delete(stagingDir(epochId), true)
      // drop the per-query parent when its last epoch dir is gone, so
      // restarts over a table's lifetime don't accumulate empty dirs
      val parent = stagingDir(epochId).getParent
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
        fs.delete(parent, false)
    }
    // ledger = live manifests ∪ the vacuum-proof sidecar (see
    // VersionedTable.streamLedgerGet); scanned once per query run
    val last = lastEpoch.orElse(vt.streamLedgerGet(queryId))
    if (last.exists(_ >= epochId)) {
      lastEpoch = last
      cleanup() // checkpoint-recovery replay of a committed epoch
      return
    }
    val (live, empty) = files.partition(_.rows > 0)
    empty.foreach(m => fs.delete(new Path(m.path), false))
    if (live.isEmpty) { cleanup(); return }
    vt.adoptFiles(live.map(_.path).toSeq,
      operation = s"$opPrefix$queryId:$epochId", mergeSchema = mergeSchema)
    vt.streamLedgerPut(queryId, epochId)
    lastEpoch = Some(epochId)
    cleanup()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = stagingDir(epochId)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  override def toString: String = s"GraftStreamingWrite[${vt.root}]"
}

object GraftStreamingWrite {

  /** The parquet write configuration Spark's own file write path sets
    * (`ParquetUtils.prepareWrite` recipe): write-support class + row
    * schema + the SQL semantics `ParquetWriteSupport.init` and the
    * schema converter read.
    */
  private[sources] def configureParquet(conf: Configuration,
                                        schema: StructType): Unit = {
    conf.set(ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(schema, conf)
    conf.set(ParquetOutputFormat.COMPRESSION, "zstd")
    conf.set("parquet.summary.metadata.level", "NONE")
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "true")
  }
}

/** Serializable factory: each task opens one staged parquet file under
  * `<root>/_staging/<queryId>/<epochId>/` named by (partition, task), so
  * speculative attempts never collide and losing attempts' files are
  * dropped by abort/cleanup. `reorder` maps committed-order slots to the
  * query-schema indices the incoming rows use.
  */
private[sources] final class GraftStreamWriterFactory(
    root: String, queryId: String, querySchema: StructType,
    reorder: Option[Seq[Int]],
    conf: SerializableWritable[Configuration])
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val path = new Path(new Path(root),
      f"_staging/$queryId/$epochId/part-$partitionId%05d-$taskId.zstd.parquet")
    new GraftStreamDataWriter(path, conf.value, querySchema, reorder,
      partitionId, taskId)
  }
}

private[sources] final class GraftStreamDataWriter(path: Path,
    conf: Configuration, querySchema: StructType, reorder: Option[Seq[Int]],
    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val context = new TaskAttemptContextImpl(conf,
    new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
      partitionId), (taskId % Int.MaxValue).toInt))
  private val writer = new ParquetOutputWriter(path.toString, context)
  // committed-order projection (None = query order already matches)
  private val project = reorder.map { idx =>
    UnsafeProjection.create(idx.map(i => BoundReference(i,
      querySchema.fields(i).dataType, querySchema.fields(i).nullable)
      : org.apache.spark.sql.catalyst.expressions.Expression))
  }
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    writer.write(project.map(_.apply(record)).getOrElse(record))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftFileMessage(path.toString, rows)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Throwable => () }
    val fs = path.getFileSystem(conf)
    if (fs.exists(path)) fs.delete(path, false)
  }

  override def close(): Unit = ()
}
