package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, LocalScan, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, InMemoryFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, Filter, InsertableRelation, StreamSinkProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 surface for [[VersionedTable]] — `spark.read.format("graft")
  * .load(root)` and SQL-text plans over the governed table, with the table's
  * own skipping machinery wired into Catalyst's pushdown contract.
  *
  * The reference's whole pipeline is table-in/table-out (reference
  * `gold.py:41-49`, `silver.py:183-184`) — the table IS the user surface, so
  * the engine's moat (per-dir + per-file stats skipping, bloom sidecars,
  * null ledgers, deletion vectors, column mapping, time travel) must be
  * reachable from a plain `spark.read` / SQL plan, not only from the
  * `VersionedTable` API.
  *
  * Scan planning:
  *   - Catalyst pushes filters ([[SupportsPushDownFilters]]) and the
  *     required columns ([[SupportsPushDownRequiredColumns]]) into
  *     [[GraftScanBuilder]].
  *   - The pushed filters are rebuilt into one `Column` predicate and
  *     handed to [[VersionedTable.scanTargetsFor]] — the same manifest-
  *     ledger boolean-tree pruning `readWhere` uses — yielding the pruned
  *     file set BEFORE Spark plans a single input partition.
  *   - Plain snapshots (no column mapping, no deletion vectors) then
  *     delegate to Spark's own vectorized parquet scan over exactly that
  *     file set: the query runs the stock columnar read path (whole-stage
  *     codegen, row-group pushdown, mergeable file partitions) and the
  *     plan's `PushedFilters`/`ReadSchema` reflect the delegation.
  *   - Snapshots that need the overlay machinery (a rename/drop mapping or
  *     merge-on-read DVs) fall back to a [[V1Scan]] whose relation builds
  *     rows through [[VersionedTable.readWhereAt]] — the exact API read
  *     path, so DV anti-joins and mapping projections can never diverge
  *     between the two surfaces.
  *
  * All pushed filters are ALSO returned as post-scan residuals: skipping is
  * a superset guarantee (never drops a matching row, may keep extras), so
  * Spark must re-evaluate the predicate — exactly `readWhere`'s discipline
  * of filtering the full predicate on top of the pruned scan.
  *
  * Options: `versionAsOf` (a committed version number) and `timestampAsOf`
  * (epoch millis; newest commit at-or-before) pin the snapshot; default is
  * the latest version at load time, pinned for the plan's lifetime.
  */
final class GraftDataSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  // ---- streaming write: spark.writeStream.format("graft") ----
  // Append-mode exactly-once sink ([[GraftStreamSink]]): every micro-batch
  // commits through the table's append protocol with a
  // `stream_append:<queryId>:<batchId>` ledger entry, so checkpoint-
  // recovery replays are detected and skipped.

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft stream sink supports Append output mode only, got $outputMode" +
        " (for streaming upserts use foreachBatch + mergeRetrying)")
    require(partitionColumns.isEmpty,
      "graft tables cluster via OPTIMIZE, not static partitions")
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft stream sink requires a path"))
    val mergeSchema = parameters.get("mergeschema")
      .orElse(parameters.get("mergeSchema")).exists(_.toBoolean)
    val spark = sqlContext.sparkSession
    // honor a catalog-declared stats_cols sidecar: streamed-in dirs must
    // keep recording the skipping/aggregate ledgers like batch commits
    new GraftStreamSink(spark, VersionedTable(spark, path,
      GraftTableProps.statsCols(spark, path)), mergeSchema)
  }

  // ---- streaming read: spark.readStream.format("graft") ----
  // The DSv2 table advertises no streaming capability, so Spark routes
  // the stream through this V1 source bridge ([[GraftChangeSource]]) —
  // a LIVE log-following change feed, option `keyCols` required.

  private def streamKeys(parameters: Map[String, String]): Seq[String] =
    parameters.get("keycols").orElse(parameters.get("keyCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "graft stream requires option keyCols (comma-separated entity key)"))

  private def streamArgs(parameters: Map[String, String]): (VersionedTable, Seq[String], Option[Long]) = {
    val spark = SparkSession.active
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft stream requires a path"))
    val anchor = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")).map(_.toLong)
    (VersionedTable(spark, path), streamKeys(parameters), anchor)
  }

  /** Dispatch: option `txnLog` selects the TRANSACTION-quantized live
    * source ([[GraftTxnSource]] — offsets are stamp ids, staged-but-
    * unstamped member commits invisible) over the member-commit-grain
    * change source. `path` stays the member table's root (it feeds
    * batch-side schema inference); `table` names the member in the log.
    */
  private def makeSource(spark: SparkSession,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    parameters.get("txnlog").orElse(parameters.get("txnLog")) match {
      case Some(log) =>
        val table = parameters.getOrElse("table",
          throw new IllegalArgumentException(
            "graft txn stream requires option table (member name in the log)"))
        val anchor = parameters.get("startingtxn")
          .orElse(parameters.get("startingTxn")).map(_.toLong)
        new GraftTxnSource(spark, MultiTableTxn(spark, log), table,
          streamKeys(parameters), anchor)
      case None =>
        val (vt, keys, anchor) = streamArgs(parameters)
        new GraftChangeSource(spark, vt, keys, anchor)
    }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), makeSource(sqlContext.sparkSession, parameters).schema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    makeSource(sqlContext.sparkSession, parameters)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDataSource.open(options)._3

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val (vt, v, s) = GraftDataSource.open(opts)
    // `keyCols` selects the CDF streaming contract: suppress the
    // micro-batch capability so the stream falls back to the V1
    // change-feed source (keyed diffs) instead of the table-follow stream
    new GraftTable(vt, v, s, cdfRequested = opts.containsKey("keycols"))
  }
}

object GraftDataSource {

  /** Resolve (table, pinned version, logical schema) from load options. */
  private[sources] def open(options: CaseInsensitiveStringMap): (VersionedTable, Long, StructType) = {
    val spark = SparkSession.active
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft source requires a path"))
    // a catalog-created table persists its tracked columns at the root —
    // honor them on path-based access too, so a format("graft") writer
    // keeps recording the ledgers the table was declared with
    val vt = VersionedTable(spark, path, GraftTableProps.statsCols(spark, path))
    val versionAsOf = Option(options.get("versionAsOf")).map(_.toLong)
    val timestampAsOf = Option(options.get("timestampAsOf")).map(_.toLong)
    val v = (versionAsOf, timestampAsOf) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "versionAsOf and timestampAsOf are mutually exclusive")
      case (Some(v0), _) =>
        require(vt.versions.contains(v0),
          s"no committed version $v0 at $path (have ${vt.versions.mkString(", ")})")
        v0
      case (_, Some(ts)) =>
        val vs = vt.versions.filter(x => vt.manifestOf(x).timestampMs <= ts)
        require(vs.nonEmpty, s"no version at or before $ts in $path")
        vs.max
      // table not committed yet: defer the error to scan planning — the
      // streaming WRITE path must resolve the provider's table for a
      // brand-new sink path (empty schema; the first committed epoch
      // defines the table through the v2 streaming write). Tradeoff: a
      // BATCH read of a typo'd path now fails at first action ("no
      // committed version") instead of at load() — the provider cannot
      // tell the two intents apart at resolution time.
      case _ => vt.latestVersion.getOrElse(
        return (vt, GraftTable.uncommittedVersion, new StructType()))
    }
    val schema = vt.schemaOf(v).getOrElse(
      throw new IllegalStateException(
        s"version $v at $path predates schema tracking; read it via the VersionedTable API"))
    (vt, v, schema)
  }

  /** Rebuild one pushed source Filter as a `Column` over `fields` (the
    * top-level logical columns). None ⇒ not pushable: the filter stays a
    * residual and contributes nothing to skipping — never wrong, only less
    * pruned. Composite nodes translate only when every child does.
    */
  /** Decode a ledger stat-domain string back to the EXACT typed value —
    * only for (dataType, kind) pairs that round-trip bit-exactly (the
    * metadata-only aggregate discipline: float/decimal/date decline).
    */
  private[sources] def statTypedValue(dt: DataType, kind: String,
                                      v: String): Option[(DataType, Any)] =
    (dt, kind) match {
      case (LongType, "int")      => Some((dt, v.toLong))
      case (IntegerType, "int")   => Some((dt, v.toInt))
      case (ShortType, "int")     => Some((dt, v.toShort))
      case (ByteType, "int")      => Some((dt, v.toByte))
      case (TimestampType, "int") => Some((dt, v.toLong))
      case (StringType, "str") =>
        Some((dt, org.apache.spark.unsafe.types.UTF8String.fromString(v)))
      case _ => None
    }

  private[graft] def filterToColumn(f: Filter, fields: Set[String]): Option[Column] = {
    def c(name: String): Column = col(s"`$name`")
    f match {
      case sources.EqualTo(a, v) if fields(a)            => Some(c(a) === lit(v))
      case sources.EqualNullSafe(a, v) if fields(a)      => Some(c(a) <=> lit(v))
      case sources.GreaterThan(a, v) if fields(a)        => Some(c(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) if fields(a) => Some(c(a) >= lit(v))
      case sources.LessThan(a, v) if fields(a)           => Some(c(a) < lit(v))
      case sources.LessThanOrEqual(a, v) if fields(a)    => Some(c(a) <= lit(v))
      case sources.In(a, vs) if fields(a)                => Some(c(a).isin(vs.toSeq: _*))
      case sources.IsNull(a) if fields(a)                => Some(c(a).isNull)
      case sources.IsNotNull(a) if fields(a)             => Some(c(a).isNotNull)
      case sources.StringStartsWith(a, p) if fields(a)   => Some(c(a).startsWith(p))
      case sources.StringEndsWith(a, p) if fields(a)     => Some(c(a).endsWith(p))
      case sources.StringContains(a, p) if fields(a)     => Some(c(a).contains(p))
      case sources.And(l, r) =>
        for (lc <- filterToColumn(l, fields); rc <- filterToColumn(r, fields))
          yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- filterToColumn(l, fields); rc <- filterToColumn(r, fields))
          yield lc || rc
      case sources.Not(child) => filterToColumn(child, fields).map(!_)
      case sources.AlwaysTrue()  => Some(lit(true))
      case sources.AlwaysFalse() => Some(lit(false))
      case _ => None
    }
  }
}

object GraftTable {
  /** Sentinel snapshot version for a table root with no commit yet: the
    * streaming write path must resolve the provider's table before
    * writing, so a brand-new sink path yields this (empty schema, reads
    * rejected at scan planning, STREAMING_WRITE advertised so the first
    * committed epoch creates the table) instead of throwing.
    */
  val uncommittedVersion: Long = -1L
}

/** One pinned snapshot of a [[VersionedTable]] as a DSv2 Table.
  *
  * Writes ride the V1 insert bridge ([[TableCapability.V1_BATCH_WRITE]]):
  * `INSERT INTO` lands as [[VersionedTable.appendRetrying]] (schema
  * enforcement + optimistic-conflict retry) and `INSERT OVERWRITE` as
  * [[VersionedTable.overwrite]] — one commit protocol for SQL and API.
  */
final class GraftTable(private[sources] val vt: VersionedTable,
                       private[sources] val snapshotVersion: Long,
                       logicalSchema: StructType,
                       cdfRequested: Boolean = false)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  // the whole suffix stays INSIDE the backticks: analysis paths (e.g.
  // streaming relation resolution) parse this as a multipart identifier
  override def name(): String = s"graft.`${vt.root}@v$snapshotVersion`"

  override def schema(): StructType = logicalSchema

  /** Surfaced by SHOW TBLPROPERTIES / DESCRIBE EXTENDED. */
  override def properties(): java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String]()
    m.put("provider", "graft")
    if (snapshotVersion != GraftTable.uncommittedVersion)
      m.put("snapshot_version", snapshotVersion.toString)
    val st = GraftTableProps.statsCols(
      org.apache.spark.sql.SparkSession.active, vt.root)
    if (st.nonEmpty) m.put("stats_cols", st.mkString(","))
    val kc = GraftTableProps.keyCols(
      org.apache.spark.sql.SparkSession.active, vt.root)
    if (kc.nonEmpty) m.put("key_cols", kc.mkString(","))
    m
  }

  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
    // streaming table reads (readStream.table) follow append-shaped
    // commits only, and the overlay machinery (mapping/DVs) needs the
    // CDF stream — don't advertise what the scan would then reject
    if (!cdfRequested && snapshotVersion != GraftTable.uncommittedVersion &&
      !vt.needsOverlayAt(snapshotVersion))
      caps.add(TableCapability.MICRO_BATCH_READ)
    // streaming writes adopt executor-written files under the query's
    // logical names — a rename/drop overlay would mis-slot them
    val mapped = snapshotVersion != GraftTable.uncommittedVersion &&
      vt.manifestOf(snapshotVersion).colMap.nonEmpty
    if (!mapped) caps.add(TableCapability.STREAMING_WRITE)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (snapshotVersion == GraftTable.uncommittedVersion)
      throw new IllegalStateException(s"no committed version at ${vt.root}")
    new GraftScanBuilder(vt, snapshotVersion, logicalSchema)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(vt, info)

  /** SQL `DELETE FROM t WHERE ...` — accepted only when every conjunct
    * translates, then executed as the table's own conflict-retried
    * dir-grained copy-on-write delete. `TRUNCATE TABLE` rides the
    * default bridge (deleteWhere over AlwaysTrue).
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f =>
      GraftDataSource.filterToColumn(f, logicalSchema.fieldNames.toSet).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters
      .flatMap(GraftDataSource.filterToColumn(_, logicalSchema.fieldNames.toSet))
      .reduceOption(_ && _).getOrElse(lit(true))
    vt.deleteRetrying(pred)
  }
}

/** INSERT INTO / INSERT OVERWRITE planner for [[GraftTable]] — and the
  * streaming-write entry (`toStreaming` → [[GraftStreamingWrite]], Append
  * output mode only: Complete/Update arrive as `truncate()` and are
  * rejected, the documented upsert path being foreachBatch + merge).
  */
final class GraftWriteBuilder(vt: VersionedTable, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var overwrite = false

  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit =
          if (overwrite) vt.overwrite(data) else vt.appendRetrying(data)
      }

    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      if (overwrite) throw new UnsupportedOperationException(
        "graft streaming write supports Append output mode only " +
          "(for streaming upserts use foreachBatch + mergeRetrying)")
      val mergeSchema = Option(info.options.get("mergeschema"))
        .exists(_.toBoolean)
      new GraftStreamingWrite(vt, info.queryId(), info.schema(), mergeSchema)
    }
  }
}

/** Pushdown-aware scan planner for one snapshot (see [[GraftDataSource]]). */
final class GraftScanBuilder(vt: VersionedTable, version: Long,
                             logicalSchema: StructType)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private val fieldNames = logicalSchema.fieldNames.toSet
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = logicalSchema
  private var aggRows: Option[(StructType, Array[Any])] = None
  private var pushedLimit: Option[Int] = None

  /** `SELECT ... LIMIT n` with no residual filter: accept the limit so
    * the scan can BOUND ITS FILE LIST from the manifest row ledger —
    * only the first dirs whose ledger rows cover `n` are even listed
    * (the `metadataCount` discipline applied to planning). Accepted only
    * when the ledger is exact: every dir row-counted, no DVs hiding
    * rows, no overlay. Partial push (the default), so Spark still
    * applies the limit on top — correctness never rests on the bound.
    */
  override def pushLimit(limit: Int): Boolean = {
    val m = vt.manifestOf(version)
    val exact = !vt.needsOverlayAt(version) &&
      m.dataDirs.forall(m.dirRows.contains)
    if (exact) pushedLimit = Some(limit)
    exact
  }

  /** Accept every filter we can rebuild as a Column (they drive skipping),
    * but return ALL filters as residuals: stats pruning is a superset
    * guarantee, so Spark must still evaluate the predicate post-scan.
    */
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

  /** Metadata-only aggregate answering: an UNFILTERED, UNGROUPED
    * `count(*)` / `count(col)` / `min(col)` / `max(col)` resolves from
    * the manifest ledgers (row counts, null counts, min/max stats) —
    * zero data files opened, the Delta-style catalog-lookup count made
    * reachable from SQL text. Declines (returns false → Spark runs the
    * normal scan + its own aggregate) whenever exactness is not
    * ledger-provable: pushed filters, group-bys, live DVs, incomplete
    * ledgers, or a stat domain that does not round-trip exactly
    * (float/decimal/date stay scans; integral, timestamp, and string
    * min/max round-trip bit-exactly).
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    aggRows.isDefined || tryPushAgg(agg)

  override def pushAggregation(agg: Aggregation): Boolean = tryPushAgg(agg)

  private def tryPushAgg(agg: Aggregation): Boolean = {
    if (predicate.nonEmpty || pushed.nonEmpty ||
      agg.groupByExpressions.nonEmpty) return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: org.apache.spark.sql.connector.expressions.NamedReference
          if f.fieldNames.length == 1 && fieldNames(f.fieldNames.head) =>
          Some(f.fieldNames.head)
        case _ => None
      }
    def typed(name: String, cs: VersionedTable.ColStats,
              v: String): Option[(DataType, Any)] =
      GraftDataSource.statTypedValue(logicalSchema(name).dataType, cs.kind, v)
    val resolved = agg.aggregateExpressions.toSeq.map {
      case _: CountStar =>
        vt.metadataCountAt(version)
          .map(n => (StructField("count(*)", LongType, nullable = false),
            n: Any))
      case c: Count if !c.isDistinct =>
        for {
          name <- colOf(c.column)
          rows <- vt.metadataCountAt(version)
          nulls <- vt.metadataNullCountAt(version, name)
        } yield (StructField(s"count($name)", LongType, nullable = false),
          (rows - nulls): Any)
      case m: Min =>
        for {
          name <- colOf(m.column)
          cs <- vt.metadataMinMaxAt(version, name)
          tv <- typed(name, cs, cs.min)
        } yield (StructField(s"min($name)", tv._1, nullable = true),
          tv._2)
      case m: Max =>
        for {
          name <- colOf(m.column)
          cs <- vt.metadataMinMaxAt(version, name)
          tv <- typed(name, cs, cs.max)
        } yield (StructField(s"max($name)", tv._1, nullable = true),
          tv._2)
      case _ => None
    }
    if (resolved.exists(_.isEmpty)) false
    else {
      aggRows = Some((StructType(resolved.flatten.map(_._1)),
        resolved.flatten.map(_._2).toArray))
      true
    }
  }

  override def build(): Scan = aggRows match {
    case Some((schema, values)) => new GraftLocalScan(vt, version, schema, values)
    case None =>
      if (vt.needsOverlayAt(version))
        new GraftV1Scan(vt, version, predicate, pushed, required)
      else new GraftRuntimeScan(vt, version, logicalSchema, predicate, required,
        limit = pushedLimit)
  }
}

/** The fast-path scan for plain snapshots: hand the manifest-pruned file
  * set to Spark's own vectorized parquet scan. Row-group pushdown,
  * columnar batches and whole-stage codegen all come from the stock read
  * path; this layer contributes exactly one thing — the file set is
  * [[VersionedTable.scanTargetsFor]]'s, so dirs and part files the
  * ledgers rule out are never even listed into the scan.
  *
  * ALSO a runtime-filterable scan ([[SupportsRuntimeV2Filtering]], the
  * DSv2 dynamic-partition-pruning contract): joining the governed table
  * against a filtered dimension makes Catalyst hand the build side's join
  * keys here as an IN predicate BEFORE input partitions are planned —
  * `filter` folds it into the predicate and rebuilds the inner scan, so
  * the manifest ledgers re-prune with the runtime values (exact per-value
  * for small key sets, [min, max] envelope beyond the expansion cap, see
  * `VersionedTable.pushNotDown`). At 100 TB this is the join-driven file
  * skipping that turns a fact-dim star probe into a few-dir read.
  * `filterAttributes` reports only ledger-tracked columns, so Catalyst
  * plans DPP subqueries only where pruning can actually bite.
  */
/** The shared "delegate to Spark's vectorized parquet scan" recipe —
  * used by the batch path ([[GraftRuntimeScan]]) and the micro-batch
  * stream ([[GraftMicroBatchStream]]), so the delegation invariants
  * (partition inference OFF — clustered snapshots store chunk dirs as
  * hive-style `_vt_chunk=N` paths which must not surface as a column —
  * shared file-status cache, column pruning) live in ONE place.
  */
private[sources] object GraftDelegatedScan {
  def build(spark: SparkSession, fileSchema: StructType, paths: Seq[Path],
            required: StructType, pushdown: Option[Column]): Scan = {
    val index = new InMemoryFileIndex(spark, paths,
      Map.empty[String, String], Some(fileSchema),
      FileStatusCache.getOrCreate(spark), Some(PartitionSpec.emptySpec))
    val sb = ParquetScanBuilder(spark, index, fileSchema, fileSchema,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    sb.pruneColumns(required)
    pushdown.foreach { p =>
      VersionedTable.resolveCondition(spark, fileSchema, p)
        .foreach(e => sb.pushFilters(Seq(e)))
    }
    sb.build()
  }
}

final class GraftRuntimeScan(vt: VersionedTable, version: Long,
                             logicalSchema: StructType,
                             basePredicate: Option[Column],
                             required: StructType,
                             limit: Option[Int] = None)
    extends Scan with SupportsRuntimeV2Filtering with SupportsReportStatistics {

  @volatile private var runtimePredicate: Option[Column] = None
  // LAZY: the manifest-pruned file listing happens only when partitions
  // (or filtered statistics) are actually needed — a scan that receives a
  // runtime filter before execution never pays for the pre-filter listing
  @volatile private var cached: Scan = _

  private def inner: Scan = {
    var c = cached
    if (c == null) { c = buildInner(); cached = c }
    c
  }

  /** The current delegated parquet scan (pruned-file introspection). */
  def delegate: Scan = inner

  private def buildInner(): Scan = {
    val spark = SparkSession.active
    val fileSchema = vt.physSchemaAt(version).getOrElse(logicalSchema)
    val predicate = (basePredicate.toSeq ++ runtimePredicate).reduceOption(_ && _)
    // pushed LIMIT with no predicate: the ledger bounds the file list —
    // take the shortest dir prefix whose exact row counts cover the limit
    // (pushLimit verified ledger exactness); any predicate (static or
    // runtime) voids the bound, rows matching it could sit anywhere
    val targets = (limit, predicate) match {
      case (Some(n), None) =>
        val m = vt.manifestOf(version)
        val picked = scala.collection.mutable.ArrayBuffer.empty[String]
        var acc = 0L
        val it = m.dataDirs.iterator
        while (acc < n && it.hasNext) {
          val d = it.next(); picked += d; acc += m.dirRows(d)
        }
        vt.dirPathsOf(picked.toSeq)
      case _ => vt.scanTargetPathsAt(version, predicate)
    }
    GraftDelegatedScan.build(spark, fileSchema,
      targets.map(new Path(_)), required, predicate)
  }

  // the pruned projection we handed the inner builder — static, so
  // reporting it does not force the file listing
  override def readSchema(): StructType = required

  override def toBatch: Batch = new Batch {
    // consult the CURRENT inner scan at plan time: BatchScanExec calls
    // filter() and then re-plans via a fresh toBatch
    override def planInputPartitions(): Array[InputPartition] =
      inner.toBatch.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      inner.toBatch.createReaderFactory()
  }

  // partition-defined (the Scan default): each FilePartition decides via
  // the reader factory, so answering this does not force the listing
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    Scan.ColumnarSupportMode.PARTITION_DEFINED

  /** `spark.readStream.table(...)` — the log-following micro-batch stream
    * (append-shaped commits as parquet partitions; see
    * [[GraftMicroBatchStream]]).
    */
  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(vt, logicalSchema, required)

  override def filterAttributes(): Array[NamedReference] = {
    val fields = logicalSchema.fieldNames.toSet
    vt.statTrackedLogicalAt(version).filter(fields)
      .map(GraftColumnBridge.fieldReference).toArray
  }

  override def filter(predicates: Array[Predicate]): Unit = {
    val fields = logicalSchema.fieldNames.toSet
    val cols = predicates.flatMap(GraftRuntimeScan.predicateToColumn(_, fields))
    if (cols.nonEmpty) {
      runtimePredicate = Some(cols.reduce(_ && _))
      cached = null // re-prune lazily with the runtime values folded in
    }
  }

  override def description(): String =
    s"GraftRuntimeScan ${vt.root}@v$version " +
      s"${limit.map(n => s"PushedLimit: $n ").getOrElse("")}${inner.description()}"

  /** Row/size estimate from the manifest row ledger so the planner can
    * judge broadcastability of the governed table without touching data
    * — the inner parquet scan's own (file-size) estimate is the
    * fallback when some dir predates row tracking.
    */
  override def estimateStatistics(): Statistics = {
    val m = vt.manifestOf(version)
    val ledger: Option[Long] =
      if (basePredicate.isEmpty && runtimePredicate.isEmpty &&
        m.dataDirs.forall(m.dirRows.contains))
        Some(m.dataDirs.map(m.dirRows).sum) // exact: unfiltered snapshot
      else None
    ledger match {
      case Some(n) => new Statistics {
        override def sizeInBytes(): OptionalLong =
          OptionalLong.of(math.max(n, 1L) * math.max(required.defaultSize, 1L))
        override def numRows(): OptionalLong = OptionalLong.of(n)
      }
      // filtered: the inner scan's estimate reflects the PRUNED file set
      case None => inner match {
        case s: SupportsReportStatistics => s.estimateStatistics()
        case _ => new Statistics {
          override def sizeInBytes(): OptionalLong = OptionalLong.empty()
          override def numRows(): OptionalLong = OptionalLong.empty()
        }
      }
    }
  }
}

object GraftRuntimeScan {

  /** Runtime V2 predicates → a Column the ledger pruning understands.
    * Catalyst hands DPP values as `IN(col, v...)` (see
    * `DataSourceV2Strategy.translateRuntimeFilterV2`); `=` handled for
    * completeness. Untranslatable predicates are DROPPED — runtime
    * filtering is advisory (the join itself still applies the condition),
    * so dropping can only under-prune, never miss rows.
    */
  private[sources] def predicateToColumn(p: Predicate,
                                         fields: Set[String]): Option[Column] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal}
    def attr(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case n: NamedReference if n.fieldNames.length == 1 &&
          fields(n.fieldNames.head) => Some(n.fieldNames.head)
        case _ => None
      }
    def literal(e: org.apache.spark.sql.connector.expressions.Expression): Option[Literal] =
      GraftColumnBridge.literalValueOf(e).map { case (v, dt) => Literal(v, dt) }
    p.name() match {
      case "IN" if p.children().nonEmpty =>
        for {
          name <- attr(p.children().head)
          lits <- Some(p.children().tail.flatMap(literal))
          if lits.length == p.children().length - 1
        } yield GraftColumnBridge.column(
          org.apache.spark.sql.catalyst.expressions.In(
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(name)),
            lits.toSeq))
      case "=" if p.children().length == 2 =>
        for {
          name <- attr(p.children()(0))
          lit <- literal(p.children()(1))
        } yield GraftColumnBridge.column(EqualTo(
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(name)),
          lit))
      case _ => None
    }
  }
}

/** Fallback scan for snapshots carrying a column-mapping overlay or
  * deletion vectors: rows come from [[VersionedTable.readWhereAt]] — the
  * API read path itself — through the V1 relation bridge, so the DSv2
  * surface can never disagree with `readWhere` on mapped/DV tables.
  */
final class GraftV1Scan(vt: VersionedTable, version: Long,
                        predicate: Option[Column], pushed: Array[Filter],
                        required: StructType)
    extends V1Scan with SupportsReportStatistics {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftV1Relation(vt, version, predicate, required, context)
      .asInstanceOf[T]

  /** Row estimate from the manifest row ledger (an upper bound under DVs)
    * — lets the planner judge broadcastability without touching data.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val m = vt.manifestOf(version)
    private val rows: Option[Long] =
      if (m.dataDirs.forall(m.dirRows.contains))
        Some(m.dataDirs.map(m.dirRows).sum)
      else None
    override def sizeInBytes(): OptionalLong = rows match {
      case Some(n) => OptionalLong.of(n * math.max(required.defaultSize, 1L))
      case None    => OptionalLong.empty()
    }
    override def numRows(): OptionalLong = rows match {
      case Some(n) => OptionalLong.of(n)
      case None    => OptionalLong.empty()
    }
  }

  override def description(): String =
    s"GraftV1Scan ${vt.root}@v$version PushedFilters: [${pushed.mkString(", ")}]"
}

private[sources] final class GraftV1Relation(vt: VersionedTable, version: Long,
    predicate: Option[Column], required: StructType, context: SQLContext)
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = context

  override def schema: StructType = required

  override def buildScan(): RDD[Row] = {
    val df = vt.readWhereAt(version, predicate)
    df.select(required.fieldNames.map(n => col(s"`$n`")).toSeq: _*).rdd
  }
}

/** The metadata-only aggregate result as a driver-local scan: one row,
  * zero input partitions, zero files opened — the ledger answer
  * ([[VersionedTable.metadataCountAt]] family) surfaced where Spark's
  * complete-aggregate-pushdown contract expects it.
  */
final class GraftLocalScan(vt: VersionedTable, version: Long,
                           schema: StructType, values: Array[Any])
    extends LocalScan {

  override def readSchema(): StructType = schema

  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
    Array(org.apache.spark.sql.catalyst.InternalRow.fromSeq(values.toSeq))

  override def description(): String =
    s"GraftLocalScan ${vt.root}@v$version metadata-only " +
      s"[${schema.fieldNames.mkString(", ")}]"
}
