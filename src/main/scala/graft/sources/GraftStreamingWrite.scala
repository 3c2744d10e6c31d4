package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetOutputFormat
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
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
  * Exactly-once: the SAME `stream_append:<queryId>:<epochId>` manifest
  * ledger as the V1 sink ([[GraftStreamSink]]) — an epoch already in the
  * log is a checkpoint-recovery replay and is skipped (its staging is
  * cleaned up). The two write paths therefore share one idempotence
  * discipline; a query can even switch between them mid-life.
  */
final class GraftStreamingWrite(vt: VersionedTable, queryId: String,
                                schema: StructType)
    extends StreamingWrite {

  private val opPrefix = "stream_append:"

  private def stagingDir(epochId: Long): Path =
    new Path(new Path(vt.root), s"_staging/$queryId/$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    GraftStreamingWrite.configureParquet(conf, schema)
    new GraftStreamWriterFactory(vt.root, queryId, schema,
      new SerializableWritable(conf))
  }

  private def committedEpoch(qid: String): Option[Long] = {
    val pref = s"$opPrefix$qid:"
    vt.versions.flatMap { v =>
      val op = vt.manifestOf(v).operation
      if (op.startsWith(pref)) op.stripPrefix(pref).toLongOption else None
    }.maxOption
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = stagingDir(epochId)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = messages.collect { case m: GraftFileMessage => m }
    def cleanup(): Unit =
      if (fs.exists(stagingDir(epochId))) fs.delete(stagingDir(epochId), true)
    if (committedEpoch(queryId).exists(_ >= epochId)) {
      cleanup() // checkpoint-recovery replay of a committed epoch
      return
    }
    val (live, empty) = files.partition(_.rows > 0)
    empty.foreach(m => fs.delete(new Path(m.path), false))
    if (live.isEmpty) { cleanup(); return }
    vt.adoptFiles(live.map(_.path).toSeq,
      operation = s"$opPrefix$queryId:$epochId")
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
    * schema + the SQL semantics `ParquetWriteSupport.init` reads.
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
  * dropped by abort/cleanup.
  */
private[sources] final class GraftStreamWriterFactory(
    root: String, queryId: String, schema: StructType,
    conf: SerializableWritable[Configuration])
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val path = new Path(new Path(root),
      f"_staging/$queryId/$epochId/part-$partitionId%05d-$taskId.zstd.parquet")
    new GraftStreamDataWriter(path, conf.value, partitionId, taskId)
  }
}

private[sources] final class GraftStreamDataWriter(path: Path,
    conf: Configuration, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val context = new TaskAttemptContextImpl(conf,
    new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
      partitionId), (taskId % Int.MaxValue).toInt))
  private val writer = new ParquetOutputWriter(path.toString, context)
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    writer.write(record)
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
