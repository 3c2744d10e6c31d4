package graft.sources

import java.util.OptionalLong

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A [[PartitionedVersionedTable]] as a DSv2 Table — the multi-repo /
  * multi-source physical layout (the reference shards its lakehouse by
  * `{owner}__{repo}`, reference `ingest.py:70-72`) speakable as SQL:
  * `CREATE TABLE ... USING graft PARTITIONED BY (repo)` routes here via
  * [[GraftCatalog]], and every operation rides the per-partition
  * transaction logs.
  *
  * Scan planning is TWO-LEVEL pruning end to end: the pushed filters'
  * bounds on the partition column select which partition LOGS are even
  * opened ([[PartitionedVersionedTable.partitionsFor]]), then each
  * surviving member table runs its own manifest-ledger dir/file pruning
  * ([[VersionedTable.scanTargetPathsAt]]), and the union of surviving
  * files delegates to Spark's vectorized parquet scan — `WHERE repo='x'`
  * opens exactly one partition's log, whatever the table's total size.
  * The scan is also runtime-filterable ([[SupportsRuntimeV2Filtering]]):
  * a join against a filtered dim hands its keys here before input
  * partitions plan, so DPP prunes whole partitions with zero user hints.
  * Snapshots needing overlay machinery (rename/drop mapping, DVs) or a
  * pinned cross-partition snapshot fall back to a [[V1Scan]] over the
  * API read path, which cannot diverge from it.
  *
  * Writes: `INSERT INTO` slices by partition value and blind-appends to
  * only the touched logs; `INSERT OVERWRITE` is whole-table overwrite
  * (static semantics — absent partitions are overwritten empty);
  * `DELETE FROM` prunes its partition sweep with the predicate's bounds.
  * UPDATE / MERGE INTO route through the same resolution rule as flat
  * tables ([[GraftSqlDml]]) onto the per-partition merge arms.
  *
  * Streaming: `readStream.table` composes the member append streams
  * (offset = member-version vector, [[GraftPartitionedMicroBatchStream]])
  * and `writeStream.toTable` routes rows through per-partition staged
  * files adopted into each touched member log plus one coordinator
  * snapshot per epoch ([[GraftPartitionedStreamingWrite]]). Per-shard
  * follows remain available as
  * `readStream.format("graft").load(root/col=value)`.
  */
final class GraftPartitionedTable(private[sources] val pvt: PartitionedVersionedTable,
                                  val root: String,
                                  val partitionCol: String,
                                  logicalSchema: StructType,
                                  pinnedSnapshot: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  override def name(): String = pinnedSnapshot match {
    case Some(id) => s"graft.`$root@s$id`"
    case None     => s"graft.`$root`"
  }

  override def schema(): StructType = logicalSchema

  override def partitioning(): Array[Transform] =
    Array(Expressions.identity(partitionCol))

  /** Surfaced by SHOW TBLPROPERTIES / DESCRIBE EXTENDED. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("provider", "graft")
    m.put("partition_col", partitionCol)
    val st = pvt.memberStats
    if (st.nonEmpty) m.put("stats_cols", st.mkString(","))
    val kc = GraftTableProps.keyCols(
      org.apache.spark.sql.SparkSession.active, root)
    if (kc.nonEmpty) m.put("key_cols", kc.mkString(","))
    pvt.latestSnapshot.foreach(s => m.put("latest_snapshot", s.toString))
    m
  }

  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
    // the composed member stream follows append-shaped member commits;
    // overlay/DV members are rejected per-batch with a CDF pointer (the
    // flat table's discipline) — a pinned snapshot is a fixed state and
    // cannot stream
    if (pinnedSnapshot.isEmpty) caps.add(TableCapability.MICRO_BATCH_READ)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftPartitionedScanBuilder(pvt, logicalSchema, pinnedSnapshot)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftPartitionedWriteBuilder(pvt, info)

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f =>
      GraftDataSource.filterToColumn(f, logicalSchema.fieldNames.toSet).isDefined)

  /** DELETE FROM with a partition-pruned sweep: the predicate's bounds on
    * the partition column keep out-of-scope logs unopened (each swept
    * partition still commits — a no-op version when nothing matches). A
    * predicate that excludes EVERY partition is a complete no-op — an
    * empty hint means "no hint" to [[PartitionedVersionedTable.delete]]
    * and would sweep the world.
    */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters
      .flatMap(GraftDataSource.filterToColumn(_, logicalSchema.fieldNames.toSet))
      .reduceOption(_ && _).getOrElse(lit(true))
    val kept = pvt.partitionsFor(pred)
    if (kept.nonEmpty) pvt.delete(pred, partitionsHint = kept)
  }
}

/** INSERT INTO (per-partition blind append) / INSERT OVERWRITE
  * (whole-table overwrite) planner for [[GraftPartitionedTable]].
  */
final class GraftPartitionedWriteBuilder(pvt: PartitionedVersionedTable,
                                         info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit =
          if (overwrite) pvt.overwriteAll(data) else pvt.append(data)
      }

    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      if (overwrite) throw new UnsupportedOperationException(
        "graft streaming write supports Append output mode only " +
          "(for streaming upserts use foreachBatch + mergeRetrying)")
      val mergeSchema = Option(info.options.get("mergeschema"))
        .exists(_.toBoolean)
      new GraftPartitionedStreamingWrite(pvt, info.queryId(), info.schema(),
        mergeSchema)
    }
  }
}

/** Pushdown-aware scan planner over the partition logs (see
  * [[GraftPartitionedTable]]). Filters drive two-level pruning and return
  * as residuals (skipping is a superset guarantee); required columns
  * reach the delegated parquet scan.
  */
final class GraftPartitionedScanBuilder(pvt: PartitionedVersionedTable,
                                        logicalSchema: StructType,
                                        pinnedSnapshot: Option[Long])
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private val fieldNames = logicalSchema.fieldNames.toSet
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = logicalSchema
  private var aggRows: Option[(StructType, Array[Any])] = None
  private var pushedLimit: Option[Int] = None
  // the per-partition versions whose ledgers justified the pushed LIMIT —
  // execution re-validates against them (see [[GraftPartitionedScan]])
  private var limitVersions: Map[String, Long] = Map.empty
  // ONE handle per member for the whole planning pass —
  // supportCompletePushDown, pushAggregation, and pushLimit all consult
  // the same manifests, and each handle caches what it read
  private lazy val members: Seq[VersionedTable] =
    pvt.partitions.map(pvt.partition)
  private var aggMemo: (AnyRef, Boolean) = null

  /** The flat table's X317 discipline at the sharded layout: an
    * unfiltered LIMIT bounds the file list to the shortest member-dir
    * prefix whose exact ledger rows cover it — partition logs past the
    * bound are not even opened. Partial push; exact ledgers only.
    */
  override def pushLimit(limit: Int): Boolean = {
    // time-travel reads never take the bounded path — check before
    // paying the per-member manifest pass
    if (pinnedSnapshot.nonEmpty) return false
    // `members` (not fresh handles): the same cached manifests
    // supportCompletePushDown/pushAggregation already read
    val checked = members.zip(pvt.partitions).map { case (vt, p) =>
      p -> vt.latestVersion.filter { v =>
        !vt.needsOverlayAt(v) && {
          val m = vt.manifestOf(v)
          m.dvs.isEmpty && m.dataDirs.forall(m.dirRows.contains)
        }
      }
    }
    val exact = checked.forall(_._2.nonEmpty)
    if (exact) {
      pushedLimit = Some(limit)
      // pin the versions the exactness proof was made against: a commit
      // landing between planning and execution (a DV delete, an
      // untracked-dir append) would break the row-coverage promise, so
      // buildInner re-checks these and falls back to the unbounded path
      limitVersions = checked.collect { case (p, Some(v)) => p -> v }.toMap
    }
    exact
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryPushAgg(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryPushAgg(agg)

  /** Metadata-only aggregates over the SHARDED layout: an unfiltered,
    * ungrouped count(*) / count(col) sums the member ledgers and
    * min(col) / max(col) folds the member stat envelopes — a catalog
    * lookup per partition log instead of a scan of the whole table.
    * Declines (normal scan) whenever ANY member's ledger is inexact
    * (DVs, untracked dirs, non-round-tripping stat domain) — the same
    * exactness discipline as the flat table's X304 pushdown.
    */
  private def tryPushAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    // Spark calls supportCompletePushDown then pushAggregation with the
    // SAME Aggregation — memoize so the member-ledger pass runs once
    if (aggMemo != null && (aggMemo._1 eq agg)) return aggMemo._2
    val r = computeAgg(agg)
    aggMemo = (agg, r)
    r
  }

  private def computeAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.types.{LongType, StructField}
    if (pinnedSnapshot.nonEmpty || predicate.nonEmpty || pushed.nonEmpty ||
      agg.groupByExpressions.nonEmpty) return false
    if (!members.forall(_.latestVersion.nonEmpty)) return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference
          if f.fieldNames.length == 1 && fieldNames(f.fieldNames.head) =>
          Some(f.fieldNames.head)
        case _ => None
      }
    def sumOver(per: VersionedTable => Option[Long]): Option[Long] = {
      val vs = members.map(per)
      if (vs.exists(_.isEmpty)) None else Some(vs.flatten.sum)
    }
    // Some(Some(cs)) = envelope; Some(None) = PROVABLY value-less member
    // (zero rows or an all-null column — contributes nothing, exactly);
    // None = inexact ledger → the whole aggregation declines
    def memberEnvelope(m: VersionedTable,
                       name: String): Option[Option[VersionedTable.ColStats]] = {
      val v = m.latestVersion.get
      m.metadataMinMaxAt(v, name) match {
        case Some(cs) => Some(Some(cs))
        case None =>
          val valueless = for {
            rows <- m.metadataCountAt(v)
            nulls <- m.metadataNullCountAt(v, name)
          } yield nulls == rows
          if (valueless.contains(true)) Some(None) else None
      }
    }
    def foldMinMax(name: String, wantMin: Boolean): Option[(org.apache.spark.sql.types.DataType, Any)] = {
      val envs = members.map(memberEnvelope(_, name))
      if (envs.exists(_.isEmpty)) None
      else {
        val list = envs.flatten.flatten
        val dt = logicalSchema(name).dataType
        if (list.isEmpty) // every member provably value-less: NULL, typed
          GraftDataSource.statTypedValue(dt, "int", "0")
            .orElse(GraftDataSource.statTypedValue(dt, "str", ""))
            .map { case (t, _) => (t, null: Any) }
        else {
          val kind = list.head.kind
          if (!list.forall(_.kind == kind)) None
          else {
            val best = list.map(cs => if (wantMin) cs.min else cs.max)
              .reduce { (a, b) =>
                val cmp = VersionedTable.statCompare(kind, a, b)
                if (if (wantMin) cmp <= 0 else cmp >= 0) a else b
              }
            GraftDataSource.statTypedValue(dt, kind, best)
          }
        }
      }
    }
    val resolved = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        sumOver(m => m.metadataCountAt(m.latestVersion.get))
          .map(n => (StructField("count(*)", LongType, nullable = false),
            n: Any))
      case c: Count if !c.isDistinct =>
        for {
          name <- colOf(c.column)
          n <- sumOver { m =>
            val v = m.latestVersion.get
            for {
              rows <- m.metadataCountAt(v)
              nulls <- m.metadataNullCountAt(v, name)
            } yield rows - nulls
          }
        } yield (StructField(s"count($name)", LongType, nullable = false),
          n: Any)
      case m: Min =>
        for {
          name <- colOf(m.column)
          tv <- foldMinMax(name, wantMin = true)
        } yield (StructField(s"min($name)", tv._1, nullable = true), tv._2)
      case m: Max =>
        for {
          name <- colOf(m.column)
          tv <- foldMinMax(name, wantMin = false)
        } yield (StructField(s"max($name)", tv._1, nullable = true), tv._2)
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) false
    else {
      aggRows = Some((StructType(resolved.flatten.map(_._1)),
        resolved.flatten.map(_._2).toArray))
      true
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(f =>
      GraftDataSource.filterToColumn(f, fieldNames).isDefined)
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def predicate: Option[Column] =
    pushed.flatMap(GraftDataSource.filterToColumn(_, fieldNames))
      .reduceOption(_ && _)

  override def build(): Scan = aggRows match {
    case Some((schema, values)) =>
      new GraftPartitionedLocalScan(pvt.tableRoot, schema, values)
    case None => buildScan()
  }

  private def buildScan(): Scan = pinnedSnapshot match {
    // a pinned cross-partition snapshot reads the RECORDED version vector
    // — the API path, where all-or-nothing visibility lives
    case Some(id) =>
      new GraftPartitionedV1Scan(pvt, logicalSchema, predicate, pushed,
        required, pinnedSnapshot = Some(id))
    case None =>
      def sameShape(a: StructType, b: StructType): Boolean =
        a.fields.map(f => (f.name, f.dataType))
          .sameElements(b.fields.map(f => (f.name, f.dataType)))
      // prune FIRST, then examine only the surviving logs: the whole
      // point of the layout is that `WHERE repo='x'` touches one log at
      // plan time, not thousands (partitionsFor itself reads one schema
      // plus the dir listing)
      val pred = predicate
      val kept = pred match {
        case Some(p) => pvt.partitionsFor(p)
        case None    => pvt.partitions
      }
      // pin the member versions proven delegatable HERE: execution reads
      // these exact (immutable) manifests, so a commit landing between
      // planning and execution — a DV delete the raw-file scan could not
      // apply, an untracked-dir append breaking a pushed LIMIT's row
      // promise — can never corrupt the read (snapshot-isolation
      // semantics, the same contract flat GraftTable scans pin at open)
      val plannedVersions: Map[String, Long] = kept.flatMap { p =>
        val vt = pvt.partition(p)
        vt.latestVersion.filter(v => !vt.needsOverlayAt(v) &&
          vt.schemaOf(v).exists(sameShape(_, logicalSchema))).map(p -> _)
      }.toMap
      val delegatable = kept.nonEmpty && plannedVersions.size == kept.size
      if (delegatable)
        new GraftPartitionedScan(pvt, logicalSchema, pred, required, kept,
          plannedVersions,
          // the LIMIT's ledger-exactness proof was made at pushLimit time
          // against limitVersions — it transfers iff those are exactly
          // the versions this scan pins (a commit in between drops the
          // bounding; Spark's re-applied LIMIT keeps the result correct)
          limit = pushedLimit.filter(_ =>
            kept.forall(p => limitVersions.get(p) == plannedVersions.get(p))))
      else
        new GraftPartitionedV1Scan(pvt, logicalSchema, pred, pushed,
          required, pinnedSnapshot = None)
  }
}

/** The metadata-only aggregate answer as a driver-local one-row scan —
  * summed/folded member ledgers, zero partition logs' data files opened.
  */
final class GraftPartitionedLocalScan(root: String, schema: StructType,
                                      values: Array[Any])
    extends org.apache.spark.sql.connector.read.LocalScan {

  override def readSchema(): StructType = schema

  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    Array(org.apache.spark.sql.catalyst.InternalRow.fromSeq(values.toSeq))

  override def description(): String =
    s"GraftPartitionedLocalScan $root metadata-only " +
      s"[${schema.fieldNames.mkString(", ")}]"
}

/** The fast-path scan: partition pruning, then each surviving member's
  * manifest/file pruning, then ONE delegated vectorized parquet scan over
  * the union of surviving files (data files store the partition column,
  * so no hive-style reconstruction is needed). Runtime-filterable — DPP
  * join keys on the partition column drop whole partition logs before
  * input partitions plan.
  */
final class GraftPartitionedScan(pvt: PartitionedVersionedTable,
                                 logicalSchema: StructType,
                                 basePredicate: Option[Column],
                                 required: StructType,
                                 staticKept: Seq[String],
                                 plannedVersions: Map[String, Long],
                                 limit: Option[Int] = None)
    extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  @volatile private var runtimePredicate: Option[Column] = None
  @volatile private var cached: Scan = _
  @volatile private var keptCache: Seq[String] = _

  private def inner: Scan = {
    var c = cached
    if (c == null) { c = buildInner(); cached = c }
    c
  }

  /** `spark.readStream.table(...)` — the composed member-log stream
    * (see [[GraftPartitionedMicroBatchStream]]).
    */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftPartitionedMicroBatchStream(pvt, logicalSchema, required)

  /** The delegated scan + the partition values it kept (spec pinning). */
  def delegate: Scan = inner
  def keptPartitions: Seq[String] = { inner; keptCache }

  private def buildInner(): Scan = {
    val spark = SparkSession.active
    val predicate = (basePredicate.toSeq ++ runtimePredicate).reduceOption(_ && _)
    // a runtime filter can only SHRINK the statically-pruned set — the
    // re-prune stays within staticKept (whose delegatability build()
    // already verified), so no new log is ever opened here
    val kept = runtimePredicate match {
      case None    => staticKept
      case Some(_) => pvt.partitionsFor(predicate.get)
        .filter(staticKept.contains)
    }
    keptCache = kept
    // every member read anchors on its PLANNED (pinned, immutable)
    // version — never re-reads latestVersion: a commit landing after
    // planning (a DV delete the raw-file delegate cannot apply, an
    // untracked dir voiding a ledger promise) must not leak into this
    // scan's execution. Snapshot isolation, manifest-immutability-cheap.
    val paths = (limit, predicate) match {
      // pushed LIMIT, no predicate: shortest member-dir prefix whose
      // exact ledger rows cover it — later partition logs stay unopened
      case (Some(n), None) =>
        val picked = scala.collection.mutable.ArrayBuffer.empty[Path]
        var acc = 0L
        val it = kept.iterator
        while (acc < n && it.hasNext) {
          val part = it.next()
          val vt = pvt.partition(part)
          val m = vt.manifestOf(plannedVersions(part))
          val dirs = m.dataDirs.iterator
          while (acc < n && dirs.hasNext) {
            val d = dirs.next()
            picked ++= vt.dirPathsOf(Seq(d)).map(new Path(_))
            acc += m.dirRows(d)
          }
        }
        picked.toSeq
      case _ =>
        kept.flatMap { part =>
          pvt.partition(part)
            .scanTargetPathsAt(plannedVersions(part), predicate)
            .map(new Path(_))
        }
    }
    GraftDelegatedScan.build(spark, logicalSchema, paths, required, predicate)
  }

  override def readSchema(): StructType = required

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      inner.toBatch.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      inner.toBatch.createReaderFactory()
  }

  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED

  /** The partition column always accepts runtime filters (partition-level
    * DPP — the headline prune), plus the FIRST kept partition's
    * ledger-tracked columns as the representative set — reading every
    * log here would cost O(partitions) at plan time, and a column
    * tracked elsewhere but not requested merely forgoes extra pruning
    * (per-member mayMatch stays superset-safe either way).
    */
  override def filterAttributes(): Array[NamedReference] = {
    val fields = logicalSchema.fieldNames.toSet
    val tracked = staticKept.headOption.toSeq.flatMap { p =>
      val vt = pvt.partition(p)
      plannedVersions.get(p).toSeq.flatMap(v =>
        vt.statTrackedLogicalAt(v).filter(fields))
    }.toSet + partitionColName
    tracked.map(GraftColumnBridge.fieldReference).toArray
  }

  private def partitionColName: String = pvt.partitionColumn

  override def filter(predicates: Array[Predicate]): Unit = {
    val fields = logicalSchema.fieldNames.toSet
    val cols = predicates.flatMap(GraftRuntimeScan.predicateToColumn(_, fields))
    if (cols.nonEmpty) {
      runtimePredicate = Some(cols.reduce(_ && _))
      cached = null
    }
  }

  override def description(): String =
    s"GraftPartitionedScan ${pvt.tableRoot} " +
      s"partitions=[${keptPartitions.mkString(", ")}] " +
      s"${limit.map(n => s"PushedLimit: $n ").getOrElse("")}${inner.description()}"

  /** Exact ledger row count when unfiltered (sum across partitions);
    * filtered scans defer to the inner parquet scan's pruned estimate.
    */
  override def estimateStatistics(): Statistics =
    if (basePredicate.isEmpty && runtimePredicate.isEmpty)
      pvt.metadataCount() match {
        case Some(n) => new Statistics {
          override def sizeInBytes(): OptionalLong =
            OptionalLong.of(n * math.max(required.defaultSize, 1L))
          override def numRows(): OptionalLong = OptionalLong.of(n)
        }
        case None => inner match {
          case s: SupportsReportStatistics => s.estimateStatistics()
          case _ => new Statistics {
            override def sizeInBytes(): OptionalLong = OptionalLong.empty()
            override def numRows(): OptionalLong = OptionalLong.empty()
          }
        }
      }
    else inner match {
      case s: SupportsReportStatistics => s.estimateStatistics()
      case _ => new Statistics {
        override def sizeInBytes(): OptionalLong = OptionalLong.empty()
        override def numRows(): OptionalLong = OptionalLong.empty()
      }
    }
}

/** Fallback scan: rows via the API read path ([[PartitionedVersionedTable
  * .readWhere]] — still two-level pruned — or [[PartitionedVersionedTable
  * .readSnapshot]] for a pinned snapshot), so overlay snapshots and
  * consistent snapshot reads can never diverge from the API surface.
  */
final class GraftPartitionedV1Scan(pvt: PartitionedVersionedTable,
                                   logicalSchema: StructType,
                                   predicate: Option[Column],
                                   pushed: Array[Filter],
                                   required: StructType,
                                   pinnedSnapshot: Option[Long])
    extends V1Scan {

  override def readSchema(): StructType = required

  /** The stream entry also lands here when the batch planner chose the
    * V1 fallback (e.g. a mid-evolution member): the micro-batch stream
    * does its own per-member append-shape checks, so it composes the
    * same way from either scan.
    */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftPartitionedMicroBatchStream(pvt, logicalSchema, required)

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftPartitionedV1Relation(pvt, logicalSchema, predicate, required,
      pinnedSnapshot, context).asInstanceOf[T]

  override def description(): String =
    s"GraftPartitionedV1Scan ${pvt.tableRoot}" +
      s"${pinnedSnapshot.map(id => s"@s$id").getOrElse("")} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
}

private[sources] final class GraftPartitionedV1Relation(
    pvt: PartitionedVersionedTable, logicalSchema: StructType,
    predicate: Option[Column], required: StructType,
    pinnedSnapshot: Option[Long], context: SQLContext)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context

  override def schema: StructType = required

  override def buildScan(): RDD[Row] = {
    val spark = context.sparkSession
    val df: DataFrame =
      if (pvt.partitions.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[Row](), logicalSchema)
      else pinnedSnapshot match {
        case Some(id) =>
          val snap = pvt.readSnapshot(id)
          predicate.map(snap.filter).getOrElse(snap)
        case None =>
          predicate.map(pvt.readWhere).getOrElse(pvt.read())
      }
    df.select(required.fieldNames.map(n => col(s"`$n`")).toSeq: _*).rdd
  }
}
