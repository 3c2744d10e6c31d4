package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.SerializableWritable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOutputWriter
import org.apache.spark.sql.types.StructType

/** Offset codec for the SHARDED streaming surfaces: a cross-partition
  * stream position is a VECTOR of member commit versions, serialized as a
  * sorted JSON object (`{"a":3,"b":0}`) so offset equality — which the
  * streaming engine decides by serialized form — is deterministic. A
  * member absent from the vector has not been read yet (its next batch
  * anchors on its current snapshot), which is also how partitions CREATED
  * mid-stream join the feed.
  */
private[sources] object PartVectorOffset {
  def write(vec: Map[String, Long]): String = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    vec.toSeq.sortBy(_._1).foreach { case (p, v) => node.put(p, v) }
    mapper.writeValueAsString(node)
  }

  def parse(json: String): Map[String, Long] = {
    val node = new ObjectMapper().readTree(json)
    val it = node.fields()
    val b = Map.newBuilder[String, Long]
    while (it.hasNext) {
      val e = it.next(); b += e.getKey -> e.getValue.asLong()
    }
    b.result()
  }
}

/** DSv2 micro-batch stream over a PARTITIONED graft table —
  * `spark.readStream.table("cat.t")` on the sharded layout the reference's
  * own `{owner}__{repo}` ingest produces. The stream COMPOSES the member
  * append streams: each trigger's offset is the member-version vector, and
  * the batch reads exactly the data dirs the covered member commits ADDED,
  * planned as ONE delegated vectorized parquet scan across all touched
  * members (data files store the partition column, so no reconstruction).
  *
  * Per-member semantics are the flat stream's
  * ([[GraftMicroBatchStream]]) verbatim: a member's first covered batch
  * is its anchor snapshot (rejected if it carries DVs or a mapping
  * overlay); later batches require the covered commits to be
  * APPEND-shaped, verified structurally; a vacuumed window fails loudly
  * instead of silently committing a data-losing batch. Offset math is a
  * pure function of the member logs, so checkpoint recovery replans
  * identical batches.
  *
  * 100-TB shape: latestOffset is a partition-dir listing plus one
  * manifest-head read per member (bounded vocabulary — repo/source/month),
  * and each batch scans only newly-added files across all shards. A
  * single hot shard cannot stall the others — the scan unions files, not
  * per-member jobs. The offset vector is O(members) serialized into the
  * checkpoint EVERY trigger (the same discipline Delta applies
  * per-stream), so member cardinality is bounded loudly:
  * [[GraftPartitionedMicroBatchStream.MaxMembersConf]] (default 10⁴)
  * rejects a layout whose vector would make each checkpoint write a
  * multi-megabyte JSON blob.
  */
final class GraftPartitionedMicroBatchStream(pvt: PartitionedVersionedTable,
                                             logicalSchema: StructType,
                                             required: StructType)
    extends MicroBatchStream {

  private case class PVOffset(json0: String) extends Offset {
    override def json(): String = json0
  }

  override def initialOffset(): Offset =
    PVOffset(PartVectorOffset.write(Map.empty))

  override def latestOffset(): Offset = {
    val parts = pvt.partitions
    val cap = SparkSession.active.conf
      .getOption(GraftPartitionedMicroBatchStream.MaxMembersConf)
      .map(_.trim.toInt)
      .getOrElse(GraftPartitionedMicroBatchStream.DefaultMaxMembers)
    require(cap >= 1,
      s"${GraftPartitionedMicroBatchStream.MaxMembersConf} must be >= 1")
    require(parts.size <= cap,
      s"partitioned stream over ${pvt.tableRoot}: ${parts.size} partition " +
        s"members exceed $cap — the member-version offset vector is " +
        "serialized into the checkpoint EVERY trigger, so this layout " +
        "would make each commit a multi-megabyte JSON write; partition " +
        "by a coarser column or raise " +
        GraftPartitionedMicroBatchStream.MaxMembersConf)
    PVOffset(PartVectorOffset.write(
      parts.flatMap { p =>
        pvt.partition(p).latestVersion.map(p -> _)
      }.toMap))
  }

  override def deserializeOffset(json: String): Offset = PVOffset(json)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  private def vec(o: Offset): Map[String, Long] = o match {
    case PVOffset(j) => PartVectorOffset.parse(j)
    case other       => PartVectorOffset.parse(other.json())
  }

  /** The flat stream's window rule applied to ONE member — the SHARED
    * [[VersionedTable.streamWindowDirs]] (anchor for an unseen member,
    * structural append-shape otherwise, loud vacuum failure) — with the
    * member-relative dirs made absolute for the composed scan.
    */
  private def memberNewDirs(part: String, sv: Long, ev: Long): Seq[Path] = {
    val vt = pvt.partitionUnchecked(part)
    val memberRoot = new Path(vt.root)
    vt.streamWindowDirs(sv, ev).map(d => new Path(memberRoot, d))
  }

  private def parquetScanOf(paths: Seq[Path]): Scan =
    GraftDelegatedScan.build(SparkSession.active, logicalSchema, paths,
      required, pushdown = None)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = vec(start)
    val e = vec(end)
    // the flat stream fails loudly on a non-append-shaped history; a
    // member that DISAPPEARS between the start and end vectors (partition
    // dir externally removed) or whose version REGRESSES (member restore)
    // must get the same treatment — iterating only the end vector would
    // silently contribute nothing for it, dropping data from the feed
    s.toSeq.sortBy(_._1).foreach { case (p, sv) =>
      e.get(p) match {
        case None => throw new IllegalStateException(
          s"stream over ${pvt.tableRoot}: partition member '$p' (version " +
            s"$sv at the batch start) is missing from the end offset — " +
            "the member dir was removed out from under the stream; the " +
            "history is not append-shaped. Restart from a fresh " +
            "checkpoint against the current table state.")
        case Some(ev) if ev < sv => throw new IllegalStateException(
          s"stream over ${pvt.tableRoot}: partition member '$p' regressed " +
            s"from version $sv to $ev (a RESTORE or external log rewrite) " +
            "— not an append-shaped history. Restart from a fresh " +
            "checkpoint against the current table state.")
        case _ => ()
      }
    }
    val paths = e.toSeq.sortBy(_._1).flatMap { case (p, ev) =>
      memberNewDirs(p, s.getOrElse(p, -1L), ev)
    }
    if (paths.isEmpty) Array.empty
    else parquetScanOf(paths).toBatch.planInputPartitions()
  }

  /** One stream-level factory from an empty-file-set template scan (the
    * flat stream's recipe): parquet partition readers are configured by
    * schema, not file set — no per-trigger listing here.
    */
  private lazy val readerFactory: PartitionReaderFactory =
    parquetScanOf(Nil).toBatch.createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def toString: String =
    s"GraftPartitionedMicroBatchStream[${pvt.tableRoot}]"
}

object GraftPartitionedMicroBatchStream {

  /** Session conf: ceiling on partition-member count for the sharded
    * stream — the offset vector costs O(members) checkpoint bytes per
    * trigger, so an unbounded vocabulary must reject loudly, not degrade
    * every commit.
    */
  val MaxMembersConf = "spark.graft.streaming.maxMembers"
  private[sources] val DefaultMaxMembers = 10000
}

/** One adopted part file of one partition slice (rows tracked so empty
  * writers clean up).
  */
private[sources] final case class GraftPartFilesMessage(
    files: Seq[(String, String, Long)]) extends WriterCommitMessage

/** DSv2 STREAMING WRITE to a PARTITIONED graft table —
  * `df.writeStream.toTable("cat.t")` on the sharded layout. Executor
  * tasks route rows by partition VALUE into per-value staged parquet
  * files (Spark's own vectorized parquet writing, no driver round-trip);
  * the epoch commit then runs PER-PARTITION ADOPTION — each touched
  * value's staged files move (never copy) into its member log via
  * [[VersionedTable.adoptFiles]] — and stamps ONE coordinator snapshot
  * for the epoch, so pinned cross-partition readers see epoch-atomic
  * states.
  *
  * Exactly-once DATA: each member records `stream_append:<qid>:<epochId>`
  * in its own manifest/sidecar ledger (the same discipline as the flat
  * sink), so a checkpoint-recovery replay skips members that already
  * adopted this epoch and completes only the missing ones — a crash
  * mid-commit converges to exactly-once adoption per member. The
  * coordinator snapshot is stamped only when this attempt adopted
  * something; a crash in the window between the last member adoption and
  * the snapshot loses only that epoch's snapshot MARKER (data is
  * committed), never duplicates rows.
  */
final class GraftPartitionedStreamingWrite(pvt: PartitionedVersionedTable,
                                           queryId: String,
                                           querySchema: StructType,
                                           mergeSchema: Boolean)
    extends StreamingWrite {

  private val opPrefix = "stream_append:"
  private val partitionCol = pvt.partitionColumn

  private def stagingDir(epochId: Long): Path =
    new Path(new Path(pvt.tableRoot), s"_staging/$queryId/$epochId")

  /** Committed physical order: the table's schema order first (marker or
    * any member's committed schema), appended columns last; a brand-new
    * table takes the query's order.
    */
  private def targetOrder: Seq[String] = {
    val spark = SparkSession.active
    val tableOrder = pvt.partitions.headOption
      .flatMap(p => pvt.partition(p).tableSchema)
      .orElse(PartitionedVersionedTable
        .readMarker(spark, pvt.tableRoot).map(_._2))
      .map(_.fieldNames.toSeq)
    tableOrder match {
      case Some(ts) =>
        val base = ts.filter(querySchema.fieldNames.contains)
        base ++ querySchema.fieldNames.filterNot(base.contains)
      case None => querySchema.fieldNames.toSeq
    }
  }

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    require(querySchema.fieldNames.contains(partitionCol),
      s"streaming write to a partitioned table needs the partition column " +
        s"'$partitionCol' in the query schema " +
        s"(got: ${querySchema.fieldNames.mkString(", ")})")
    val order = targetOrder
    val writeSchema = StructType(order.map(n => querySchema(n)))
    val reorder: Option[Seq[Int]] =
      if (order == querySchema.fieldNames.toSeq) None
      else Some(order.map(querySchema.fieldIndex))
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    GraftStreamingWrite.configureParquet(conf, writeSchema)
    new GraftPartitionedStreamWriterFactory(pvt.tableRoot, partitionCol,
      queryId, querySchema, reorder, new SerializableWritable(conf),
      spark.sessionState.conf.sessionLocalTimeZone)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val fs = stagingDir(epochId)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = messages.collect { case m: GraftPartFilesMessage => m }
      .flatMap(_.files)
    def cleanup(): Unit = {
      if (fs.exists(stagingDir(epochId))) fs.delete(stagingDir(epochId), true)
      val parent = stagingDir(epochId).getParent
      if (fs.exists(parent) && fs.listStatus(parent).isEmpty)
        fs.delete(parent, false)
    }
    val live = files.filter(_._3 > 0)
    if (live.isEmpty) { cleanup(); return }
    val op = s"$opPrefix$queryId:$epochId"
    var adoptedAny = false
    // deterministic member order; each member's ledger decides replay
    // independently, so a partially-committed crash converges
    val touched = live.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (value, slice) =>
        val vt = pvt.partitionUnchecked(pvt.validate(value))
        if (vt.streamLedgerGet(queryId).exists(_ >= epochId)) None
        else {
          val v = vt.adoptFiles(slice.map(_._2), operation = op,
            mergeSchema = mergeSchema)
          vt.streamLedgerPut(queryId, epochId)
          adoptedAny = true
          Some(value -> v)
        }
    }
    // one epoch-atomic coordinator snapshot; skipped when EVERY member
    // was a replay (the snapshot then already exists or is the one
    // marker a crash window may cost — see the class doc)
    if (adoptedAny)
      pvt.commitSnapshot(s"stream_epoch:$queryId:$epochId", touched)
    cleanup()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val dir = stagingDir(epochId)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
  }

  override def toString: String =
    s"GraftPartitionedStreamingWrite[${pvt.tableRoot}]"
}

/** Serializable factory: each task keeps ONE open staged parquet writer
  * per partition VALUE it sees (bounded vocabulary by the layout's
  * contract), under `<root>/_staging/<qid>/<epoch>/<col>=<value>/`, named
  * by (partition, task) so speculative attempts never collide.
  */
private[sources] final class GraftPartitionedStreamWriterFactory(
    root: String, partitionCol: String, queryId: String,
    querySchema: StructType, reorder: Option[Seq[Int]],
    conf: SerializableWritable[Configuration], sessionTz: String)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftPartitionedStreamDataWriter(root, partitionCol, queryId,
      epochId, conf.value, querySchema, reorder, partitionId, taskId,
      sessionTz)
}

private[sources] final class GraftPartitionedStreamDataWriter(
    root: String, partitionCol: String, queryId: String, epochId: Long,
    conf: Configuration, querySchema: StructType, reorder: Option[Seq[Int]],
    partitionId: Int, taskId: Long, sessionTz: String)
    extends DataWriter[InternalRow] {

  private val partIdx = querySchema.fieldIndex(partitionCol)
  private val partDt = querySchema.fields(partIdx).dataType
  // the SAME string the batch path's `col(partitionCol).cast("string")`
  // slice produces — a raw internal value (date = days-since-epoch int,
  // timestamp = micros long) would name a DIFFERENT member dir than the
  // batch writer and split one logical partition across two logs
  private val partToString =
    org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        partIdx, partDt, nullable = true),
      org.apache.spark.sql.types.StringType, Option(sessionTz))
  private val valuePattern =
    java.util.regex.Pattern.compile("[A-Za-z0-9._-]+")
  // committed-order projection (None = query order already matches)
  private val project = reorder.map { idx =>
    UnsafeProjection.create(idx.map(i => BoundReference(i,
      querySchema.fields(i).dataType, querySchema.fields(i).nullable)
      : org.apache.spark.sql.catalyst.expressions.Expression))
  }
  // one open writer per partition value this task sees
  private val writers =
    mutable.LinkedHashMap.empty[String, (ParquetOutputWriter, Path)]
  private val rows = mutable.Map.empty[String, Long]

  private def writerFor(value: String): ParquetOutputWriter =
    writers.getOrElseUpdate(value, {
      // validate once per DISTINCT value (the map miss), not per row
      require(valuePattern.matcher(value).matches(),
        s"unsafe $partitionCol partition value '$value' in streaming " +
          "write (allowed: [A-Za-z0-9._-])")
      val path = new Path(new Path(root),
        f"_staging/$queryId/$epochId/$partitionCol=$value/" +
          f"part-$partitionId%05d-$taskId.zstd.parquet")
      val context = new TaskAttemptContextImpl(conf,
        new TaskAttemptID(new TaskID(new JobID("graft", 0), TaskType.MAP,
          partitionId), (taskId % Int.MaxValue).toInt))
      (new ParquetOutputWriter(path.toString, context), path)
    })._1

  override def write(record: InternalRow): Unit = {
    require(!record.isNullAt(partIdx),
      s"null $partitionCol partition value in streaming write")
    val value = partToString.eval(record).toString
    writerFor(value).write(project.map(_.apply(record)).getOrElse(record))
    rows.update(value, rows.getOrElse(value, 0L) + 1L)
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    GraftPartFilesMessage(writers.toSeq.map { case (v, (_, p)) =>
      (v, p.toString, rows.getOrElse(v, 0L))
    })
  }

  override def abort(): Unit = {
    writers.values.foreach { case (w, p) =>
      try w.close() catch { case _: Throwable => () }
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  override def close(): Unit = ()
}
