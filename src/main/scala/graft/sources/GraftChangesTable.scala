package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The governed table's change-data feed as a VIRTUAL catalog table —
  * the Iceberg metadata-table spelling:
  *
  * {{{
  *   spark.readStream
  *     .option("keyCols", "id")          // the entity key the diff is keyed on
  *     .option("startingVersion", "0")   // optional: anchor history inclusively
  *     .table("cat.t.changes")
  * }}}
  *
  * `cat.t.changes` resolves here whenever `t` is a governed table and no
  * real table named `changes` shadows it. The schema is the data columns
  * plus `_change_type` / `_commit_version` — which is why CDF needs its
  * own table object: a v2 streaming relation's columns come from the
  * TABLE schema, so the diff columns must live there, not be invented by
  * the scan. The stream itself ([[GraftCdfMicroBatchStream]]) shares its
  * batch math with the path-based V1 source ([[GraftChangeBatches]]) —
  * `readStream.format("graft").option("keyCols", ...)` and this spelling
  * literally cannot diverge.
  *
  * Batch reads are the anchored `table_changes(start, end)` form — see
  * [[GraftChangesScan]]; an un-anchored batch read (no `startingVersion`)
  * rejects loudly, and `endingVersion` bounds BOTH spellings (a stream
  * stops following the log past it — the Delta CDF contract).
  */
final class GraftChangesTable(private[sources] val vt: VersionedTable)
    extends Table with SupportsRead {

  override def name(): String = s"graft.`${vt.root}#changes`"

  override def schema(): StructType = GraftChangeBatches.cdfSchema(vt)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftChangesScanBuilder(vt, schema(), options)
}

final class GraftChangesScanBuilder(vt: VersionedTable,
                                    fullSchema: StructType,
                                    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // per-query option wins; otherwise the table's declared default key
    // (`key_cols` TBLPROPERTIES at CREATE) — the only spelling a pure-SQL
    // consumer (`SELECT * FROM cat.t.changes`) can reach
    val keyCols = Option(options.get("keycols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(Some(GraftTableProps.keyCols(SparkSession.active, vt.root))
        .filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        "the changes table needs .option(\"keyCols\", \"<entity key>\") — " +
          "the column set the keyed diff matches rows on — or a table-" +
          "level default via TBLPROPERTIES ('key_cols'='...') at CREATE"))
    val startingVersion = Option(options.get("startingversion")).map(_.toLong)
    val endingVersion = Option(options.get("endingversion")).map(_.toLong)
    new GraftChangesScan(vt, keyCols, startingVersion, endingVersion,
      fullSchema, required)
  }
}

/** The changes table's scan — BOTH spellings on one object:
  *
  *  - streaming ([[toMicroBatchStream]]): snapshot-then-follow keyed
  *    diffs, `startingVersion` anchoring history inclusively;
  *  - batch ([[org.apache.spark.sql.connector.read.V1Scan]]): the Delta
  *    `table_changes(start, end)` semantic — the keyed diffs COMMITTED in
  *    `[startingVersion, endingVersion]` (end defaults to latest;
  *    startingVersion 0 means "since genesis": version 0's own rows
  *    surface as the anchor-snapshot inserts). `startingVersion` is
  *    REQUIRED for batch reads — an unanchored full-history replay is
  *    almost never what a batch consumer means.
  */
final class GraftChangesScan(vt: VersionedTable, keyCols: Seq[String],
                             startingVersion: Option[Long],
                             endingVersion: Option[Long],
                             fullSchema: StructType, required: StructType)
    extends org.apache.spark.sql.connector.read.V1Scan {

  override def readSchema(): StructType = required

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCdfMicroBatchStream(
      s"GraftCdfMicroBatchStream[${vt.root}, keys=${keyCols.mkString(",")}]",
      () => vt.latestVersion, endingVersion,
      (s, e) => GraftChangeBatches.frame(vt, keyCols, startingVersion, s, e,
        fullSchema),
      fullSchema, required, checkpointLocation)

  override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
      with org.apache.spark.sql.sources.TableScan](
      context: org.apache.spark.sql.SQLContext): T =
    new GraftChangesV1Relation(vt, keyCols, startingVersion, endingVersion,
      fullSchema, required, context).asInstanceOf[T]

  override def description(): String =
    s"GraftChangesScan ${vt.root} keys=[${keyCols.mkString(",")}]" +
      startingVersion.map(v => s" startingVersion=$v").getOrElse("")
}

private[sources] final class GraftChangesV1Relation(
    vt: VersionedTable, keyCols: Seq[String],
    startingVersion: Option[Long], endingVersion: Option[Long],
    fullSchema: StructType, required: StructType,
    context: org.apache.spark.sql.SQLContext)
    extends org.apache.spark.sql.sources.BaseRelation
    with org.apache.spark.sql.sources.TableScan {

  override def sqlContext: org.apache.spark.sql.SQLContext = context

  override def schema: StructType = required

  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    val sv = startingVersion.getOrElse(throw new IllegalArgumentException(
      "batch reads of the changes table need " +
        ".option(\"startingVersion\", <n>) — the commits whose changes to " +
        "return; use readStream for snapshot-then-follow"))
    val latest = vt.latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at ${vt.root}"))
    val endV = endingVersion.getOrElse(latest)
    // an out-of-range window must ERROR, not read as "no changes" — a
    // consumer that typos the anchor would otherwise advance its cursor
    // past commits it never saw (the Delta table_changes contract)
    require(sv >= 0 && sv <= latest,
      s"startingVersion $sv out of range [0, $latest] at ${vt.root}")
    require(endV >= sv && endV <= latest,
      s"endingVersion $endV out of range [$sv, $latest] at ${vt.root}")
    val frame =
      if (sv == 0L)
        GraftChangeBatches.frame(vt, keyCols, Some(0L), None, endV, fullSchema)
      else
        GraftChangeBatches.frame(vt, keyCols, None, Some(sv - 1), endV, fullSchema)
    frame.select(required.fieldNames.map(n =>
      org.apache.spark.sql.functions.col(s"`$n`")).toSeq: _*).rdd
  }
}

/** DSv2 micro-batch stream of keyed CDF diffs. Offsets are commit
  * versions (flat tables) or coordinator snapshot ids (partitioned
  * tables) — both sequential longs handed in via `latestCommitted` and
  * `frameFor`, so ONE stream object serves both layouts; each trigger's
  * diff frame (anchor snapshot first, keyed pre/post-image diffs after)
  * is SPOOLED once to zstd parquet under the query's checkpoint location
  * and then planned as ordinary vectorized parquet partitions, so
  * executors read change rows like any batch scan — no driver-side row
  * materialization, whatever the diff size. The spool write is
  * compute-once (replays of a planned batch reuse the spooled files —
  * also what makes recovery deterministic even though a diff JOIN is not
  * file-granular), and [[commit]] prunes spool dirs the checkpoint has
  * durably passed.
  */
final class GraftCdfMicroBatchStream(label: String,
                                     latestCommitted: () => Option[Long],
                                     endingVersion: Option[Long],
                                     frameFor: (Option[Long], Long) => org.apache.spark.sql.DataFrame,
                                     fullSchema: StructType,
                                     required: StructType,
                                     checkpointLocation: String)
    extends MicroBatchStream {

  private case class VOffset(v: Long) extends Offset {
    override def json(): String = v.toString
  }

  override def initialOffset(): Offset = VOffset(-1L)

  /** `endingVersion` BOUNDS the stream: commits past it are never
    * offered as offsets, so the query drains up to the bound and then
    * idles — the Delta CDF endingVersion contract.
    */
  override def latestOffset(): Offset =
    VOffset(math.min(latestCommitted().getOrElse(-1L),
      endingVersion.getOrElse(Long.MaxValue)))

  override def deserializeOffset(json: String): Offset = VOffset(json.toLong)

  override def stop(): Unit = ()

  private def ver(o: Offset): Long = o match {
    case VOffset(v) => v
    case other => other.json().toLong
  }

  private def spoolRoot = new Path(checkpointLocation, "graft_cdf_spool")

  private def fs(p: Path) =
    p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)

  /** Spool dir for the batch `(s, e]` — written once, reused on replay. */
  private def spoolFor(s: Long, e: Long): Path = {
    val dir = new Path(spoolRoot, s"b${s}_$e")
    val f = fs(dir)
    if (!f.exists(dir)) {
      val frame = frameFor(if (s < 0) None else Some(s), e)
      val tmp = new Path(spoolRoot,
        s".tmp_b${s}_${e}_${java.util.UUID.randomUUID().toString.take(8)}")
      frame.write.mode("overwrite").option("compression", "zstd")
        .parquet(tmp.toString)
      if (!f.rename(tmp, dir)) { // lost a rare planner race: reuse the winner
        f.delete(tmp, true)
        require(f.exists(dir), s"spool write for batch ($s, $e] failed")
      }
    }
    dir
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = ver(start)
    val e = ver(end)
    if (e < 0 || e <= s) return Array.empty
    GraftDelegatedScan.build(SparkSession.active, fullSchema,
      Seq(spoolFor(s, e)), required, pushdown = None)
      .toBatch.planInputPartitions()
  }

  private lazy val readerFactory: PartitionReaderFactory =
    GraftDelegatedScan.build(SparkSession.active, fullSchema, Nil, required,
      pushdown = None).toBatch.createReaderFactory()

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  /** The checkpoint has durably passed `end`: spooled batches at or
    * before it can never replay — drop them. Also sweeps `.tmp_b*` debris
    * a crashed spool write left behind (the restart writes under a fresh
    * UUID, so an orphan would otherwise accumulate forever), with the
    * same in-flight age window the table's own vacuum uses.
    */
  override def commit(end: Offset): Unit = {
    val e = ver(end)
    val f = fs(spoolRoot)
    val tmpCutoff = System.currentTimeMillis() - 60 * 60 * 1000L
    if (f.exists(spoolRoot))
      f.listStatus(spoolRoot).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("b")) n.split("_") match {
          case Array(_, endPart) if endPart.toLongOption.exists(_ < e) =>
            f.delete(st.getPath, true)
          case _ => ()
        }
        else if (n.startsWith(".tmp_b") && st.getModificationTime < tmpCutoff)
          f.delete(st.getPath, true)
      }
  }

  override def toString: String = label
}
