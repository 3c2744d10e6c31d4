package graft.sources

import java.util.Collections

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructField, StructType}

/** SQL-text MAINTENANCE surface over governed tables — DSv2 procedures
  * (`ProcedureCatalog`, the Spark-4 `CALL` statement):
  *
  * {{{
  *   CALL cat.compact(tbl => 'issues')
  *   CALL cat.optimize(tbl => 'issues', cluster_by => 'id,status')
  *   CALL cat.compact_small(tbl => 'issues', min_rows => 1000)
  *   CALL cat.vacuum(tbl => 'issues', keep_versions => 2)
  * }}}
  *
  * With DDL (CREATE/ALTER/DROP), DML (INSERT/UPDATE/DELETE/MERGE), queries
  * (incl. time travel) and these, the ENTIRE table lifecycle is speakable
  * as SQL text — no API call required anywhere, which is where the
  * reference's users live (reference `gold.py:41-49` table-in/table-out).
  * Each procedure delegates to the table's own commit-protocol operation;
  * the result is a one-row driver-local scan reporting what was done.
  */
object GraftProcedures {

  val names: Seq[String] = Seq("compact", "optimize", "compact_small",
    "compact_bucketed", "vacuum", "history", "scan_report", "detail",
    "restore", "clone", "partitions", "export_delta", "export_iceberg",
    "txn_commit", "txn_history", "txn_vector", "txn_vacuum",
    "txn_clone", "txn_materialize", "txn_as_of", "txn_rebase")

  /** Build the procedure `name` (case-insensitive); `tableOf` resolves a
    * table name within the owning catalog's warehouse, `rootOf` maps a
    * table name to its warehouse root WITHOUT requiring existence (the
    * clone destination).
    */
  def load(name: String, tableOf: String => VersionedTable,
           rootOf: String => String = identity): Option[UnboundProcedure] = {
    def p(n: String, dt: DataType): ProcedureParameter =
      ProcedureParameter.in(n, dt).build()
    def pd(n: String, dt: DataType, default: String): ProcedureParameter =
      ProcedureParameter.in(n, dt).defaultValue(default).build()
    // the sharded layout resolves through its marker: compact / vacuum /
    // history run per-partition-log with a cross-partition result, and
    // `partitions` is its own procedure; everything else stays flat-only
    // transaction-LOG arguments accept a catalog-relative name OR a raw
    // filesystem root (forks often live outside the warehouse — txn_clone's
    // dest_log is a raw path, and the fork must stay operable: materialize,
    // as_of, vacuum, history all take this). '/' never occurs in a valid
    // catalog name, so the dispatch is unambiguous.
    def txnLogRoot(arg: String): String =
      if (arg.contains("/")) arg else rootOf(arg)
    def pvtOf(tblName: String): Option[PartitionedVersionedTable] = {
      val spark = org.apache.spark.sql.SparkSession.active
      val root = rootOf(tblName)
      PartitionedVersionedTable.readMarker(spark, root).map {
        case (c, _, st) =>
          new PartitionedVersionedTable(spark, root, c, memberStatsCols = st)
      }
    }
    name.toLowerCase match {
      case "compact" => Some(proc("compact",
        Array(p("tbl", StringType)),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          Array(pvtOf(tbl).map(_.compactAll())
            .getOrElse(tableOf(tbl).compact()): Any)
        }))
      case "optimize" => Some(proc("optimize",
        Array(p("tbl", StringType), p("cluster_by", StringType),
          pd("n_chunks", IntegerType, "16"), pd("curve", StringType, "'z'")),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          val cols = row.getUTF8String(1).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val (nChunks, curve) = (row.getInt(2), row.getUTF8String(3).toString)
          Array(pvtOf(tbl).map(_.optimizeAll(cols, nChunks, curve))
            .getOrElse(tableOf(tbl).compactClustered(cols, nChunks, curve)): Any)
        }))
      case "compact_small" => Some(proc("compact_small",
        Array(p("tbl", StringType), p("min_rows", LongType)),
        StructType(Seq(StructField("version", LongType, nullable = true))),
        row => {
          val vt = tableOf(row.getUTF8String(0).toString)
          Array(vt.compactSmallRetrying(row.getLong(1)).orNull: Any)
        }))
      // the X370 write-once/join-many layout as SQL text: rewrite the
      // snapshot into ONE Spark-bucketed dir on the given keys (content
      // untouched — layout maintenance like `optimize`, but hash-bucketed
      // for repeated equi-joins instead of range-clustered for pruning).
      // Library readers surface the layout via readVersionBucketed; the
      // catalog's own DSv2 scan reads the same bytes as plain parquet
      // (DSv2 has no hash-bucket reporting without a FunctionCatalog
      // bucket transform — documented, not pretended). Flat tables only:
      // bucketing INSIDE a sharded member would compose with partition
      // routing, which no current consumer needs.
      case "compact_bucketed" => Some(proc("compact_bucketed",
        Array(p("tbl", StringType), p("bucket_by", StringType),
          pd("n_buckets", IntegerType, "32"),
          pd("sort_by", StringType, "''")),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          require(pvtOf(tbl).isEmpty,
            s"compact_bucketed supports flat tables; '$tbl' is partitioned")
          val cols = row.getUTF8String(1).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val sortCols = row.getUTF8String(3).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val vt = tableOf(tbl)
          // rebucket = read-head + CAS commit: a concurrent commit fails
          // the rewrite with ConcurrentWriteException instead of being
          // silently erased by a retried stale overwrite
          Array(vt.rebucket(row.getInt(2), cols, sortCols): Any)
        }))
      case "vacuum" => Some(proc("vacuum",
        Array(p("tbl", StringType), pd("keep_versions", IntegerType, "2")),
        StructType(Seq(StructField("live_versions", LongType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          pvtOf(tbl) match {
            case Some(pvt) => // keep_versions = cross-partition SNAPSHOTS
              pvt.vacuum(row.getInt(1))
              Array(pvt.snapshots.size.toLong: Any)
            case None =>
              val vt = tableOf(tbl)
              vt.vacuum(row.getInt(1))
              Array(vt.versions.size.toLong: Any)
          }
        }))
      case "history" => Some(procRows("history",
        Array(p("tbl", StringType)),
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("timestamp_ms", LongType, nullable = false),
          StructField("num_data_dirs", IntegerType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          pvtOf(tbl) match {
            case Some(pvt) => // snapshot log newest-first; dirs = parts
              pvt.snapshots.reverse.map { id =>
                val (op, ts, n) = pvt.snapshotDetail(id)
                InternalRow(id,
                  org.apache.spark.unsafe.types.UTF8String.fromString(op),
                  ts, n)
              }.toArray
            case None => tableOf(tbl).history().map(m =>
              InternalRow(m.version,
                org.apache.spark.unsafe.types.UTF8String.fromString(m.operation),
                m.timestampMs, m.dataDirs.size)).toArray
          }
        }))
      case "scan_report" => Some(procRows("scan_report",
        Array(p("tbl", StringType), p("predicate", StringType)),
        StructType(Seq(
          StructField("dir", StringType, nullable = false),
          StructField("opened", org.apache.spark.sql.types.BooleanType, nullable = false),
          StructField("ledger_rows", LongType, nullable = true),
          StructField("files_total", LongType, nullable = true),
          StructField("files_opened", LongType, nullable = true))),
        row => {
          val tbl = row.getUTF8String(0).toString
          val pred = org.apache.spark.sql.functions
            .expr(row.getUTF8String(1).toString)
          // partitioned: partition pruning first (pruned members' logs
          // stay unopened), then per-member dir-grain reports
          pvtOf(tbl).map(_.scanReport(pred))
            .getOrElse(tableOf(tbl).scanReport(pred))
            .collect().map(r => InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
            r.getBoolean(1),
            if (r.isNullAt(2)) null else r.getLong(2),
            if (r.isNullAt(3)) null else r.getLong(3),
            if (r.isNullAt(4)) null else r.getLong(4)))
        }))
      case "partitions" => Some(procRows("partitions",
        Array(p("tbl", StringType)),
        StructType(Seq(
          StructField("value", StringType, nullable = false),
          StructField("latest_version", LongType, nullable = false),
          StructField("ledger_rows", LongType, nullable = true))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val root = rootOf(row.getUTF8String(0).toString)
          val colName = PartitionedVersionedTable.readMarker(spark, root)
            .map(_._1).getOrElse(throw new IllegalArgumentException(
              s"$root is not a partitioned graft table"))
          val pvt = PartitionedVersionedTable(spark, root, colName)
          pvt.partitions.map { v =>
            val m = pvt.partition(v)
            InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(v),
              m.latestVersion.getOrElse(-1L),
              m.metadataCount().map(n => n: Any).getOrElse(null))
          }.toArray
        }))
      case "restore" => Some(proc("restore",
        Array(p("tbl", StringType), p("version", LongType)),
        StructType(Seq(StructField("version", LongType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          // partitioned: `version` means coordinator SNAPSHOT id (the
          // layout's only cross-partition-consistent version notion)
          Array(pvtOf(tbl).map(_.restoreSnapshot(row.getLong(1)))
            .getOrElse(tableOf(tbl).restore(row.getLong(1))): Any)
        }))
      case "clone" => Some(proc("clone",
        Array(p("tbl", StringType), p("dest", StringType)),
        StructType(Seq(StructField("dest_root", StringType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          val spark = org.apache.spark.sql.SparkSession.active
          val destRoot = pvtOf(tbl) match {
            case Some(pvt) =>
              val d = pvt.shallowCloneTo(rootOf(row.getUTF8String(1).toString))
              // the marker travels inside shallowCloneTo; the key_cols
              // sidecar (changes-feed default key) rides separately
              val kc = GraftTableProps.keyCols(spark, pvt.tableRoot)
              if (kc.nonEmpty) GraftTableProps.write(spark, d.tableRoot,
                GraftTableProps.statsCols(spark, pvt.tableRoot), kc)
              d.tableRoot
            case None =>
              val vt = tableOf(tbl)
              val dest = vt.shallowCloneTo(
                rootOf(row.getUTF8String(1).toString))
              // the clone must keep recording the source's declared
              // ledgers: carry the stats_cols sidecar, or later catalog
              // writes on the clone silently stop tracking
              val st = GraftTableProps.statsCols(spark, vt.root)
              val kc = GraftTableProps.keyCols(spark, vt.root)
              if (st.nonEmpty || kc.nonEmpty)
                GraftTableProps.write(spark, dest.root, st, kc)
              dest.root
          }
          Array(org.apache.spark.unsafe.types.UTF8String
            .fromString(destRoot): Any)
        }))
      case "detail" => Some(procRows("detail",
        Array(p("tbl", StringType)),
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("timestamp_ms", LongType, nullable = false),
          StructField("num_data_dirs", IntegerType, nullable = false),
          StructField("num_rows", LongType, nullable = true),
          StructField("size_bytes", LongType, nullable = false),
          StructField("live_dvs", IntegerType, nullable = false))),
        row => {
          val tbl = row.getUTF8String(0).toString
          // partitioned: coordinator-snapshot identity facts + member
          // sums (version = latest snapshot id, -1 when none exists)
          val (v, op, ts, dirs, rows, size, dvs) = pvtOf(tbl)
            .map(_.detailAll())
            .getOrElse {
              val d = tableOf(tbl).detail()
              (d.version, d.operation, d.timestampMs, d.numDataDirs,
                d.numRows, d.sizeBytes, d.liveDvs)
            }
          Array(InternalRow(v,
            org.apache.spark.unsafe.types.UTF8String.fromString(op),
            ts, dirs, rows.orNull, size, dvs))
        }))
      // open-format interop from SQL text — with these, the WHOLE table
      // lifecycle INCLUDING handing the data to a foreign runtime is
      // speakable as SQL. Metadata-only walks (X106/X142): no rows copy,
      // the exported layout references this table's parquet in place.
      // `dest` is a filesystem root (exports live outside the catalog
      // namespace by design — their consumer is a DIFFERENT engine).
      case "export_delta" => Some(proc("export_delta",
        Array(p("tbl", StringType), p("dest", StringType)),
        StructType(Seq(StructField("commits", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val vt = tableOf(row.getUTF8String(0).toString)
          Array(DeltaLogExport.export(spark, vt,
            row.getUTF8String(1).toString).size.toLong: Any)
        }))
      case "export_iceberg" => Some(proc("export_iceberg",
        Array(p("tbl", StringType), p("dest", StringType)),
        StructType(Seq(StructField("snapshots", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val vt = tableOf(row.getUTF8String(0).toString)
          Array(IcebergExport.export(spark, vt,
            row.getUTF8String(1).toString).size.toLong: Any)
        }))
      // ---- cross-table transactions (MultiTableTxn, X367) as SQL text:
      // stage member commits however you like (INSERT/MERGE/API), then
      // stamp the manifest with CALL. Consistent reads compose with the
      // existing time-travel SQL: CALL txn_vector gives each table's
      // pinned version, `VERSION AS OF` reads it.
      case "txn_commit" => Some(proc("txn_commit",
        Array(p("log", StringType), p("op", StringType),
          p("tbls", StringType), p("versions", StringType)),
        StructType(Seq(StructField("txn", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val logRoot = txnLogRoot(row.getUTF8String(0).toString)
          val op = row.getUTF8String(1).toString
          val names = row.getUTF8String(2).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).toSeq
          val vers = row.getUTF8String(3).toString.split(",")
            .map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
          require(names.nonEmpty && names.length == vers.length,
            s"tbls (${names.length}) and versions (${vers.length}) " +
              "must pair up")
          // layout-agnostic staging: flat members pin commit versions,
          // PARTITIONED members pin coordinator snapshot ids — readAt
          // and txn_vacuum dispatch on each root's marker
          val staged = names.zip(vers).map { case (n, v) =>
            val root = rootOf(n)
            require(PartitionedVersionedTable
              .readMarker(spark, root).isDefined ||
              new VersionedTable(spark, root).latestVersion.isDefined,
              s"no graft table '$n' in this catalog")
            (n, root, v)
          }
          Array(new MultiTableTxn(spark, logRoot)
            .commitAtRetrying(op, staged): Any)
        }))
      case "txn_history" => Some(procRows("txn_history",
        Array(p("log", StringType)),
        StructType(Seq(
          StructField("txn", LongType, nullable = false),
          StructField("operation", StringType, nullable = false),
          StructField("timestamp_ms", LongType, nullable = false),
          StructField("n_tables", IntegerType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val txn = new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
          txn.txns.reverse.map { id =>
            val (op, ts, vec) = txn.stampDetail(id) // one read per stamp
            InternalRow(id,
              org.apache.spark.unsafe.types.UTF8String.fromString(op),
              ts, vec.size)
          }.toArray
        }))
      case "txn_vector" => Some(procRows("txn_vector",
        Array(p("log", StringType), p("txn", LongType)),
        StructType(Seq(
          StructField("tbl", StringType, nullable = false),
          StructField("root", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val txn = new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
          txn.vector(row.getLong(1)).toSeq.sortBy(_._1).map {
            case (n, (root, v)) => InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(n),
              org.apache.spark.unsafe.types.UTF8String.fromString(root), v)
          }.toArray
        }))
      // fork a training run from SQL text: clone every member at txn's
      // pins into <dest_log>/tables/<name> and stamp the fork as txn 0
      // of the new log ([[MultiTableTxn.cloneAt]]). `dest_log` is a
      // filesystem root like the export procedures' dest — the fork's
      // members live outside the catalog namespace until registered.
      case "txn_clone" => Some(procRows("txn_clone",
        Array(p("log", StringType), p("txn", LongType),
          p("dest_log", StringType)),
        StructType(Seq(
          StructField("tbl", StringType, nullable = false),
          StructField("dest_root", StringType, nullable = false),
          StructField("pinned", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val txn = new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
          val destLog = row.getUTF8String(2).toString
          val dest = txn.cloneAt(row.getLong(1), destLog)
          dest.vector(0L).toSeq.sortBy(_._1).map {
            case (n, (root, v)) => InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(n),
              org.apache.spark.unsafe.types.UTF8String.fromString(root), v)
          }.toArray
        }))
      // discharge the fork's retention dependency from SQL: restore each
      // member to its pin, compact, stamp ([[MultiTableTxn.materialize]])
      case "txn_materialize" => Some(proc("txn_materialize",
        Array(p("log", StringType), p("txn", LongType)),
        StructType(Seq(StructField("stamped", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          Array(new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
            .materialize(row.getLong(1)): Any)
        }))
      // TIMESTAMP AS OF on the manifest log: the newest stamp <= ts_ms —
      // composes with txn_vector + VERSION AS OF for consistent reads at
      // a wall-clock instant
      case "txn_as_of" => Some(proc("txn_as_of",
        Array(p("log", StringType), p("ts_ms", LongType)),
        StructType(Seq(StructField("txn", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          Array(new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
            .asOfTimestamp(row.getLong(1)): Any)
        }))
      // pull the source's delta onto a fork from SQL. key_cols: either
      // one comma-separated key set for every member ("id" / "id,ts"),
      // or per-table "name=k1|k2;name2=k" when members key differently.
      case "txn_rebase" => Some(proc("txn_rebase",
        Array(p("log", StringType), p("source_log", StringType),
          p("key_cols", StringType), pd("policy", StringType, "'fail'")),
        StructType(Seq(StructField("stamped", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val fork = new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
          val src = new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(1).toString))
          val spec = row.getUTF8String(2).toString
          val keyFor: String => Seq[String] =
            if (!spec.contains("=")) {
              val ks = spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
              _ => ks
            } else {
              val m = spec.split(";").map(_.trim).filter(_.nonEmpty).map { e =>
                e.split("=", 2) match {
                  case Array(n, ks) => n.trim ->
                    ks.split('|').map(_.trim).filter(_.nonEmpty).toSeq
                  case _ => throw new IllegalArgumentException(
                    s"malformed key_cols entry '$e' — expected name=k1|k2")
                }
              }.toMap
              name => m.getOrElse(name, throw new IllegalArgumentException(
                s"key_cols names no keys for member '$name' " +
                  s"(have: ${m.keys.toSeq.sorted.mkString(", ")})"))
            }
          Array(fork.rebase(src, keyFor,
            row.getUTF8String(3).toString): Any)
        }))
      case "txn_vacuum" => Some(proc("txn_vacuum",
        Array(p("log", StringType), pd("keep_txns", IntegerType, "2")),
        StructType(Seq(StructField("live_txns", LongType, nullable = false))),
        row => {
          val spark = org.apache.spark.sql.SparkSession.active
          val txn = new MultiTableTxn(spark,
            txnLogRoot(row.getUTF8String(0).toString))
          txn.vacuum(row.getInt(1))
          Array(txn.txns.size.toLong: Any)
        }))
      case _ => None
    }
  }

  private def proc(procName: String, params: Array[ProcedureParameter],
                   out: StructType,
                   run: InternalRow => Array[Any]): UnboundProcedure =
    procRows(procName, params, out,
      input => Array(InternalRow.fromSeq(run(input).toSeq)))

  private def procRows(procName: String, params: Array[ProcedureParameter],
                       out: StructType,
                       run: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String =
        s"graft table maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure = this
      override def parameters(): Array[ProcedureParameter] = params
      override def isDeterministic: Boolean = false
      override def call(input: InternalRow): java.util.Iterator[Scan] =
        Collections.singletonList(new LocalScan {
          private val resultRows = run(input)
          override def readSchema(): StructType = out
          override def rows(): Array[InternalRow] = resultRows
          override def description(): String = s"graft $procName result"
        }: Scan).iterator()
    }
}
