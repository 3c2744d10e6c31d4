package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Transaction-log-lite versioned table over parquet — the lakehouse-table
  * semantics the reference gets from "read only the newest snapshot"
  * (reference `silver.py:12-17`, `README.md:22`), generalized to real
  * versioned-table behavior: snapshot isolation, time travel, schema
  * enforcement + additive evolution, row-level DELETE, and a transactional
  * MERGE keyed on the entity id.
  *
  * Delta/Iceberg jars are not available in this offline build, so the layer
  * implements the same core protocol directly over the Hadoop FileSystem
  * API (works on local FS and HDFS-compatible stores alike):
  *
  * Layout:
  * {{{
  *   <root>/_txlog/00000000000000000000.json   // manifest for version 0
  *   <root>/_txlog/00000000000000000001.json
  *   <root>/_txlog/_checkpoint.json            // log summary (advisory cache)
  *   <root>/data/c000000000-<uuid>/part-*.parquet
  * }}}
  *
  * Each manifest is the COMPLETE state of one version: the list of data
  * directories that make up the snapshot (copy-on-write; no delete vectors)
  * plus the committed table schema. Commit = write the data first, then move
  * the next manifest into place with a fails-if-destination-exists rename,
  * so of two concurrent writers at most one wins version N and the loser
  * gets a [[ConcurrentWriteException]] (optimistic concurrency, same
  * protocol as Delta's log-entry put-if-absent). Readers never see a
  * half-written version: a manifest only becomes visible after its data is
  * fully on disk, and old versions stay readable until [[vacuum]].
  *
  * Every `checkpointInterval`-th commit also writes `_checkpoint.json`, a
  * summary of ALL manifests so far — [[history]]/[[readAsOf]]/[[vacuum]]
  * load it in one read instead of re-reading O(versions) manifest files
  * (Delta's `_last_checkpoint` discipline). The checkpoint is an advisory
  * cache: it is always reconcilable against the manifest listing, a stale
  * or missing checkpoint only costs extra manifest reads, never
  * correctness.
  *
  * Both MERGE and DELETE are dir-grained copy-on-write: one discovery job
  * finds the data dirs containing matched rows and only those rewrite;
  * untouched dirs (and their skipping stats) carry into the new version
  * as-is. Partitioning the table (one VersionedTable per partition, e.g.
  * per repo/month — [[PartitionedVersionedTable]]) composes on top, the
  * same discipline Delta users apply with partition-pruned MERGE
  * predicates. MERGE matches keys by SQL equality, so null keys never
  * match — a null-keyed update row inserts rather than replacing a
  * null-keyed table row (Delta/Iceberg MERGE semantics).
  */
final class VersionedTable(spark: SparkSession, val root: String,
                           statsCols: Seq[String] = Nil,
                           checkpointInterval: Int = 10,
                           constraints: Seq[(String, String)] = Nil,
                           bloomCols: Seq[String] = Nil,
                           fileStats: Boolean = false) {

  import VersionedTable._

  require(checkpointInterval >= 1, "checkpointInterval must be >= 1")

  /** CHECK-constraint enforcement (Delta-style, SQL semantics: a row
    * violates only when the expression is FALSE — null passes). Incoming
    * rows of overwrite/append/merge are validated in ONE aggregate pass
    * over all constraints before any data is written, so a rejected commit
    * leaves no new version and no orphan files beyond none (the check runs
    * first). Existing rows were validated at their own commit time; DELETE
    * cannot introduce violations and is not re-checked. Merge updates are
    * checked even when a delete arm would drop them — conservative and
    * cheap at update-frame scale.
    */
  private def validateConstraints(df: DataFrame, op: String): Unit =
    checkConstraints(df, constraints, op)

  /** Discovery tokens are the RELATIVE "data/c…[/chunk=N]" form; manifest
    * entries are usually the same, but a shallow clone's entries are
    * absolute paths into the source table — suffix-match so both resolve
    * (the uuid in the dir name makes suffix collisions negligible).
    */
  private def matchesToken(entry: String, tokens: Set[String]): Boolean =
    tokens.exists(t => entry == t || entry.endsWith("/" + t))

  /** A manifest entry owned by ANOTHER table's root (shallow-clone ref):
    * readable, but never deleted by this table's vacuum. Clone refs are
    * written fully-qualified ([[shallowCloneTo]] uses `fs.makeQualified`),
    * so a scheme (`file:/…`, `hdfs://…`) or a rooted path marks foreign.
    */
  private def isForeign(d: String): Boolean =
    d.startsWith("/") || d.contains(":/")

  private val rootPath = new Path(root)
  private val logPath = new Path(rootPath, "_txlog")
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------- log

  /** All committed versions, ascending. */
  def versions: Seq[Long] =
    if (!fs.exists(logPath)) Seq.empty
    else fs.listStatus(logPath).map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("_"))
      .map(n => n.stripSuffix(".json").toLong).toSeq.sorted

  def latestVersion: Option[Long] = versions.lastOption

  /** O(1) existence probe of version `v` — one manifest-file stat, no
    * log listing. [[MultiTableTxn.commitAt]]'s per-stamp pin validation
    * (a `versions.contains` there would be a full `_txlog` listing per
    * staged member per stamp — real driver latency for a per-microbatch
    * stamper on an object store).
    */
  def versionExists(v: Long): Boolean = fs.exists(manifestPath(v))

  private def manifestPath(v: Long): Path =
    new Path(logPath, f"$v%020d.json")

  private def checkpointPath: Path = new Path(logPath, "_checkpoint.json")

  /** FS reads of individual manifest files — the cost the checkpoint
    * exists to bound; exposed so specs can pin it.
    */
  @volatile private[graft] var manifestFsReads: Long = 0L

  /** Committed manifests are immutable, so caching by version is safe for
    * the lifetime of a handle; vacuum evicts what it drops.
    */
  private val manifestCache =
    scala.collection.concurrent.TrieMap.empty[Long, Manifest]
  @volatile private var checkpointLoaded = false

  private def readFully(p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      Iterator.continually(in.read(tmp)).takeWhile(_ >= 0)
        .foreach(n => buf.write(tmp, 0, n))
      buf.toByteArray
    } finally in.close()
  }

  private def readManifestFs(v: Long): Manifest = {
    manifestFsReads += 1
    parseManifest(mapper.readTree(readFully(manifestPath(v))))
  }

  /** Cache → checkpoint (loaded once per handle) → manifest file. */
  private def manifest(v: Long): Manifest =
    manifestCache.getOrElse(v, {
      if (!checkpointLoaded) {
        loadCheckpoint()
        checkpointLoaded = true
      }
      manifestCache.getOrElseUpdate(v, readManifestFs(v))
    })

  /** Best-effort: a torn/corrupt checkpoint (non-atomic overwrite on some
    * stores) degrades to plain manifest reads, never to wrong answers.
    */
  private def loadCheckpoint(): Unit =
    try {
      if (fs.exists(checkpointPath)) {
        val node = mapper.readTree(readFully(checkpointPath))
        node.get("entries").elements().asScala.foreach { e =>
          val m = parseManifest(e)
          manifestCache.putIfAbsent(m.version, m)
        }
      }
    } catch { case NonFatal(_) => () }

  private def writeCheckpoint(): Unit = {
    val json = mapper.createObjectNode()
    val arr = json.putArray("entries")
    versions.foreach(v => arr.add(manifestNode(mapper, manifest(v))))
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json)
    val tmp = new Path(logPath,
      s"._cptmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, /* overwrite = */ true)
    try out.write(bytes) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      rootPath.toUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(tmp, checkpointPath,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch { case NonFatal(_) => fs.delete(tmp, false) } // advisory: best-effort
  }

  /** Commit a manifest for version `v`: the JSON is fully written to a
    * temp file first, then moved into place with `FileContext.rename`
    * without the OVERWRITE option — readers can never observe a partial
    * manifest. On HDFS-class stores that rename is an atomic
    * create-if-absent, so of two racing writers exactly one wins; on
    * `RawLocalFileSystem` (tests, `file:` URIs) the exists-check and the
    * rename are separate syscalls, so the conflict guarantee is
    * best-effort there — point production tables at a store with atomic
    * rename (HDFS/ABFS/GCS; S3 needs a log-store layer, same as Delta).
    * Only the already-exists rename failure is a conflict; any other I/O
    * error propagates as itself (a permissions/disk failure must NOT be
    * reported as a concurrent writer).
    */
  /** Commit ops whose row-grain change set is worth materializing at
    * write time: the rewrite families, where a dir-grained diff reads
    * whole rewritten dirs to surface a few changed rows. Appends are
    * excluded (their pruned diff already reads only the new dirs — the
    * change set itself) and so are overwrite/restore/clone (their change
    * set IS the table; materializing would duplicate it).
    */
  private val cdfMaterializeOps: Set[String] =
    Set("merge", "merge_into", "update", "delete", "delete_dv")

  private def changeDataDir(v: Long): Path =
    new Path(rootPath, f"_change_data/v$v%010d")

  /** Opt-in write-time CDF materialization
    * (`graft.cdf.write = true`): after a rewrite commit, the commit's
    * row-grain change set — the already-PRUNED [[changes]] of the single
    * transition, computed while the rewritten dirs are page-cache-warm —
    * persists under `_change_data/v<N>`, so every later CDF read of the
    * transition is O(changed ROWS), not O(changed dirs). Best-effort by
    * design: a failure here logs and leaves no file (the commit itself
    * already succeeded), and readers transparently fall back to the
    * pruned diff. [[vacuumKeeping]] sweeps files of dropped versions.
    */
  private def maybeWriteChangeData(v: Long, operation: String): Unit = {
    if (v <= 0 || !cdfMaterializeOps.contains(operation)) return
    val on = spark.conf.getOption(VersionedTable.WriteCdfConf)
      .exists(_.trim.equalsIgnoreCase("true"))
    if (!on) return
    // no recorded schema (grandfathered pre-tracking table) ⇒ the read
    // guard can never validate the file — don't pay the job for waste
    if (schemaOf(v).isEmpty) return
    try changes(v - 1, v).write.mode("overwrite")
      .parquet(changeDataDir(v).toString)
    catch {
      case NonFatal(e) =>
        // remove the partial dir so a later read's existence probe never
        // sees a half-written file set — fallback must stay transparent
        try fs.delete(changeDataDir(v), true) catch { case NonFatal(_) => () }
        System.err.println(
          s"[graft] change-data materialization for v$v of $root failed " +
            s"(readers fall back to the pruned diff): ${e.getMessage}")
    }
  }

  /** The materialized change file of single transition `v-1` → `v`, when
    * present AND still matching version `v`'s logical shape — a rename
    * landing after materialization leaves stale column names, so shape
    * drift falls back to recomputation rather than serving stale names.
    */
  private def readChangeData(v: Long): Option[DataFrame] = {
    val p = changeDataDir(v)
    // the job-commit marker gates completeness: a crashed/in-flight
    // materialization (dir exists, no _SUCCESS) must fall back to the
    // pruned diff, never crash or serve a partial file set
    if (!fs.exists(p) || !fs.exists(new Path(p, "_SUCCESS"))) return None
    try {
      val df = spark.read.parquet(p.toString)
      val want = schemaOf(v).map(_.fieldNames.toSeq :+ "_change_type")
      if (want.contains(df.columns.toSeq)) Some(df) else None
    } catch { case NonFatal(_) => None }
  }

  private def commit(m: Manifest): Long = {
    val v = commitManifest(m)
    maybeWriteChangeData(v, m.operation)
    v
  }

  private def commitManifest(m: Manifest): Long = {
    // JVM-local per-root commit lock (the local "log store"): same-process
    // writers — parallel streaming queries, a compaction hook racing an
    // append — serialize here, making the exists-check + rename atomic
    // WITHIN the process even on stores whose rename-if-absent is
    // best-effort (RawLocalFileSystem). Cross-process safety still comes
    // from the store's atomic create-if-absent rename (HDFS/ABFS/GCS),
    // exactly Delta's local-log-store discipline.
    VersionedTable.rootLock(rootPath.toUri.toString).synchronized {
      fs.mkdirs(logPath)
      if (fs.exists(manifestPath(m.version)))
        throw new ConcurrentWriteException(
          s"version ${m.version} was committed by a concurrent writer", null)
      // strictly monotonic commit timestamps (Delta's in-commit-timestamp
      // discipline): two commits inside one wall-clock millisecond would
      // otherwise make TIMESTAMP AS OF at the first commit's stamp
      // silently resolve to the second
      val mono =
        if (m.version == 0) m
        else {
          val prevTs =
            scala.util.Try(manifest(m.version - 1).timestampMs).toOption
          prevTs match {
            case Some(p) if m.timestampMs <= p => m.copy(timestampMs = p + 1)
            case _ => m
          }
        }
      val bytes = mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsBytes(manifestNode(mapper, mono))
      val tmp = new Path(logPath,
        s".tmp-${m.version}-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, /* overwrite = */ true)
      try out.write(bytes) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        rootPath.toUri, spark.sparkContext.hadoopConfiguration)
      try fc.rename(tmp, manifestPath(m.version))
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          fs.delete(tmp, false)
          throw new ConcurrentWriteException(
            s"version ${m.version} was committed by a concurrent writer", e)
        case e: Throwable => fs.delete(tmp, false); throw e
      }
      manifestCache.put(mono.version, mono)
      if ((mono.version + 1) % checkpointInterval == 0) writeCheckpoint()
      mono.version
    }
  }

  /** Commit history, newest first (like DESCRIBE HISTORY). */
  def history(): Seq[Manifest] = versions.reverse.map(manifest)

  /** DESCRIBE DETAIL-style snapshot summary, metadata-first: everything
    * but `sizeBytes` comes from the manifest (row count from the ledger —
    * None under live DVs or pre-tracking dirs, like [[metadataCount]]);
    * `sizeBytes` lists the live data dirs' file lengths (an FS walk of the
    * live dirs only, no data read).
    */
  final case class TableDetail(
      version: Long, operation: String, timestampMs: Long,
      numDataDirs: Int, numRows: Option[Long], sizeBytes: Long,
      liveDvs: Int, schema: Option[StructType])

  def detail(): TableDetail = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val size = m.dataDirs.map { d =>
      val p = if (isForeign(d)) new Path(d) else new Path(rootPath, d)
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
    }.sum
    TableDetail(v, m.operation, m.timestampMs, m.dataDirs.size,
      metadataCount(), size, m.dvs.size, schemaOf(v))
  }

  /** The manifest committed as version `v` (like DESCRIBE DETAIL). */
  def manifestOf(v: Long): Manifest = manifest(v)

  /** The data dirs (table-relative) that the APPEND-SHAPED commits in
    * `(sv, ev]` added — the ONE window rule behind both streaming table
    * reads (the flat [[GraftMicroBatchStream]] and each member of the
    * composed partitioned stream), so the two surfaces cannot drift:
    * `sv < 0` anchors on snapshot `ev` (rejected if it carries DVs or a
    * mapping overlay — a raw parquet read would resurrect deleted rows /
    * stale names); otherwise every covered commit must be STRUCTURALLY
    * append-shaped (no dir removed, no new DVs, mapping unchanged) and a
    * vacuumed window fails loudly instead of silently committing a
    * data-losing empty batch.
    */
  private[sources] def streamWindowDirs(sv: Long, ev: Long): Seq[String] = {
    if (ev < 0 || ev <= sv) return Nil
    if (sv < 0) {
      val m = manifest(ev)
      if (m.dvs.nonEmpty || m.colMap.nonEmpty)
        throw new IllegalStateException(
          s"streaming table read requires append-shaped history; the anchor " +
            s"snapshot v$ev of $root carries deletion vectors or a column " +
            "mapping — use spark.readStream.format(\"graft\")" +
            ".option(\"keyCols\", ...) for the keyed change-data-feed stream")
      m.dataDirs
    } else {
      val vs = versions.filter(v => v > sv && v <= ev)
      // the end offset was a live version when the trigger planned it:
      // an empty window here means retention dropped the manifests —
      // fail rather than silently commit a data-losing empty batch
      if (vs.isEmpty) throw new IllegalStateException(
        s"versions ($sv, $ev] of $root are gone (vacuumed?); " +
          "cannot replay this micro-batch")
      vs.flatMap { v =>
        val prev = manifest(v - 1)
        val cur = manifest(v)
        val removed = prev.dataDirs.filterNot(cur.dataDirs.contains)
        val newDvs = cur.dvs.filterNot(prev.dvs.contains)
        if (removed.nonEmpty || newDvs.nonEmpty || cur.colMap != prev.colMap)
          throw new IllegalStateException(
            s"streaming table read requires append-shaped commits; version $v " +
              s"(${cur.operation}) of $root rewrites data — use " +
              "spark.readStream.format(\"graft\").option(\"keyCols\", ...) " +
              "for the keyed change-data-feed stream instead")
        cur.dataDirs.filterNot(prev.dataDirs.contains)
      }
    }
  }

  /** Schema committed as version `v`, when recorded (tables written before
    * schema tracking have none and are grandfathered — no enforcement).
    */
  def schemaOf(v: Long): Option[StructType] =
    physSchemaOf(v).map { phys =>
      val m = manifest(v)
      if (m.colMap.isEmpty) phys
      else org.apache.spark.sql.types.StructType(m.colMap.map { case (p, l) =>
        phys(p).copy(name = l)
      })
    }

  /** Schema of the FILES committed as version `v` — what [[schemaOf]] maps
    * the column overlay onto. Identical until a rename/drop activates the
    * mapping; writes and schema evolution always operate here.
    */
  private def physSchemaOf(v: Long): Option[StructType] =
    manifest(v).schemaJson.map(parseSchema)

  /** The live table schema. */
  def tableSchema: Option[StructType] = latestVersion.flatMap(schemaOf)

  // ------------------------------------------------- column mapping

  /** The active (physical, logical) projection of `m` — identity over the
    * physical schema until a rename/drop commits a real overlay.
    */
  private def mappingOf(m: Manifest): Seq[(String, String)] =
    if (m.colMap.nonEmpty) m.colMap
    else m.schemaJson.map(parseSchema(_).fields.map(f => f.name -> f.name).toSeq)
      .getOrElse(Nil)

  /** logical → physical; identity (and total) while no overlay is active. */
  private def logToPhys(m: Manifest): Map[String, String] =
    mappingOf(m).map { case (p, l) => l -> p }.toMap

  /** Resolve one user-facing column name to its physical slot. */
  private def physName(m: Manifest, logical: String): String =
    if (m.colMap.isEmpty) logical
    else logToPhys(m).getOrElse(logical, throw new IllegalArgumentException(
      s"no column '$logical' in table $root (logical columns: " +
        s"${m.colMap.map(_._2).mkString(", ")})"))

  /** Physical frame → user-facing frame: project through the overlay
    * (renames apply, dropped physical columns vanish). No-op — not even a
    * Project node — while the mapping is identity.
    */
  private def applyMapping(m: Manifest, df: DataFrame): DataFrame =
    if (m.colMap.isEmpty) df
    else df.select(m.colMap.map { case (p, l) => col(p).as(l) }: _*)

  /** The tracked-column config (statsCols/bloomCols) as PHYSICAL names: a
    * handle may be constructed with either the original names or the
    * current logical ones — both must land on the same (physical) stats
    * keys, or a rename would silently stop the skipping index.
    */
  private def physTracked(cols: Seq[String]): Seq[String] =
    latestVersion.map(manifest).filter(_.colMap.nonEmpty) match {
      case Some(m) =>
        val mp = logToPhys(m)
        cols.map(c => mp.getOrElse(c, c)).distinct
      case None => cols
    }

  /** Physical slot for a NEW logical column while mapping is active: the
    * logical name itself unless some file already carries a column of that
    * name (i.e. it was dropped — its bytes still exist), in which case a
    * version-suffixed fresh slot prevents resurrection.
    */
  private def freshPhysName(m: Manifest, logical: String, v: Long): String = {
    val taken = m.schemaJson.map(parseSchema(_).fieldNames.toSet)
      .getOrElse(Set.empty)
    if (!taken.contains(logical)) logical else s"${logical}__m$v"
  }

  /** DROPPED physical columns re-added as typed nulls, so write-path
    * schema enforcement and alignment see the full physical file schema
    * (the user's frame legitimately lacks what a drop hid from them).
    */
  private def withDroppedNulls(m: Manifest, df: DataFrame): DataFrame =
    if (m.colMap.isEmpty) df
    else m.schemaJson.map(parseSchema).map { phys =>
      val mapped = m.colMap.map(_._1).toSet
      phys.fields
        .filterNot(f => mapped.contains(f.name) || df.columns.contains(f.name))
        .foldLeft(df)((acc, f) =>
          acc.withColumn(f.name, lit(null).cast(f.dataType)))
    }.getOrElse(df)

  /** Rewrite a user predicate/expression into physical column names —
    * pruning, discovery jobs, and row filters all run against physical
    * frames. Unresolved attributes (the normal `col("x")` case) and
    * resolved references both translate; names outside the mapping are
    * left for the analyzer to reject with its usual unresolved-column
    * error.
    */
  private def toPhysicalCol(m: Manifest, c: Column): Column =
    if (m.colMap.isEmpty) c
    else {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
      import org.apache.spark.sql.catalyst.plans.logical.Project
      // Spark 4 Columns are lazy ColumnNode trees — analyze against a
      // zero-row LOGICAL probe first (which also validates the user's
      // column references with the usual analyzer error), then swap every
      // resolved reference for an unresolved PHYSICAL-name attribute so
      // the result re-binds on any physical frame.
      val phys = parseSchema(m.schemaJson.getOrElse(throw new IllegalStateException(
        s"column mapping requires a committed schema at $root")))
      val physByName = phys.fields.map(f => f.name -> f).toMap
      val logicalSchema = org.apache.spark.sql.types.StructType(
        m.colMap.map { case (p, l) => physByName(p).copy(name = l) })
      val probe = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), logicalSchema)
      val analyzed = probe.select(c.as("__vt_px")).queryExecution.analyzed
      val projected = analyzed.collectFirst {
        case p: Project => p.projectList.head
      }.getOrElse(throw new IllegalStateException(
        s"cannot analyze expression against $root's schema: $c"))
      val inner = projected match { case a: Alias => a.child; case e => e }
      val mp = logToPhys(m)
      org.apache.spark.sql.GraftColumnBridge.column(inner.transform {
        case a: AttributeReference =>
          UnresolvedAttribute(Seq(mp.getOrElse(a.name, a.name)))
      })
    }

  private def toPhysicalExpr(
      m: Manifest,
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    if (m.colMap.isEmpty) e
    else {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      import org.apache.spark.sql.catalyst.expressions.AttributeReference
      val mp = logToPhys(m)
      e.transform {
        case a: UnresolvedAttribute if mp.contains(a.name) =>
          UnresolvedAttribute(Seq(mp(a.name)))
        case a: AttributeReference if mp.contains(a.name) =>
          a.withName(mp(a.name))
      }
    }

  /** ALTER TABLE … RENAME COLUMN, metadata-only: ONE manifest write, zero
    * data I/O — at 100 TB a rename must not rewrite 100 TB. The files keep
    * their physical column names; the committed overlay maps them to the
    * new user-facing name. All stats/blooms/sidecars stay valid because
    * they are keyed physically.
    */
  def renameColumn(oldName: String, newName: String): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(cur)
    require(m.schemaJson.nonEmpty,
      s"table $root predates schema tracking; rename needs a committed schema")
    val mapping = mappingOf(m)
    require(mapping.exists(_._2 == oldName),
      s"no column '$oldName' in table $root")
    require(!mapping.exists(_._2 == newName),
      s"column '$newName' already exists in table $root")
    val next = mapping.map { case (p, l) =>
      (p, if (l == oldName) newName else l)
    }
    commit(m.copy(version = cur + 1, operation = "rename_column",
      timestampMs = System.currentTimeMillis(), colMap = next))
  }

  /** ALTER TABLE … ADD COLUMN, metadata-only: the committed schema gains
    * a trailing NULLABLE column and not a single data file is touched —
    * every pre-add dir reads the column as null (the explicit-schema
    * parquet read null-fills absent columns), later writes carry it. On a
    * mapped table the new logical name takes a fresh physical slot
    * ([[freshPhysName]]), so a column dropped earlier under the same name
    * can never resurrect its stale bytes.
    */
  def addColumn(name: String, dataType: DataType): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(cur)
    require(m.schemaJson.nonEmpty,
      s"table $root predates schema tracking; add needs a committed schema")
    val mapping = mappingOf(m)
    require(!mapping.exists(_._2 == name),
      s"column '$name' already exists in table $root")
    val v = cur + 1
    val phys = parseSchema(m.schemaJson.get)
    val physName =
      if (m.colMap.isEmpty) name else freshPhysName(m, name, v)
    require(m.colMap.nonEmpty || !phys.fieldNames.contains(name),
      s"physical column '$name' already present in $root")
    commit(m.copy(version = v, operation = "add_column",
      timestampMs = System.currentTimeMillis(),
      schemaJson = Some(StructType(
        phys.fields :+ StructField(physName, dataType, nullable = true)).json),
      colMap = if (m.colMap.isEmpty) Nil else m.colMap :+ (physName -> name)))
  }

  /** ALTER TABLE … DROP COLUMN, metadata-only: the physical column stays
    * in the files (and keeps its reserved name, see [[freshPhysName]]) but
    * vanishes from every read. The bytes persist until [[compact]] /
    * [[overwrite]] rebuilds the table (physical schema stays uniform
    * across all live dirs, so partial rewrites keep carrying the column).
    */
  def dropColumn(name: String): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(cur)
    require(m.schemaJson.nonEmpty,
      s"table $root predates schema tracking; drop needs a committed schema")
    val mapping = mappingOf(m)
    require(mapping.exists(_._2 == name), s"no column '$name' in table $root")
    require(mapping.size > 1, s"cannot drop the last column of $root")
    commit(m.copy(version = cur + 1, operation = "drop_column",
      timestampMs = System.currentTimeMillis(),
      colMap = mapping.filterNot(_._2 == name)))
  }

  /** ALTER TABLE … ALTER COLUMN x TYPE t, metadata-only: the committed
    * schema's column takes the WIDER type and not a single data file is
    * rewritten — Spark 4's vectorized parquet reader natively reads the
    * old narrower physical files under the widened schema (the same fact
    * the write-path [[VersionedTable.evolve]] widening relies on). Only
    * the lossless chains are accepted ([[VersionedTable.widen]]:
    * byte→short→int→long, float→double) — they keep the column in the
    * SAME stat kind, so every recorded dir min/max ledger and bloom
    * sidecar (probed by VALUE, not physical width) keeps pruning
    * correctly. Same-type is a no-op (no commit). Anything else rejects.
    */
  def widenColumn(name: String, newType: DataType): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(cur)
    require(m.schemaJson.nonEmpty,
      s"table $root predates schema tracking; widen needs a committed schema")
    val physN = mappingOf(m).find(_._2 == name).map(_._1).getOrElse(
      throw new IllegalArgumentException(s"no column '$name' in table $root"))
    val phys = parseSchema(m.schemaJson.get)
    val curType = phys(physN).dataType
    if (curType == newType) return cur
    require(VersionedTable.widen(curType, newType).contains(newType),
      s"ALTER COLUMN $name TYPE ${newType.simpleString}: not a lossless " +
        s"widening of ${curType.simpleString} (allowed: byte→short→int→" +
        "long, float→double)")
    commit(m.copy(version = cur + 1, operation = "widen_column",
      timestampMs = System.currentTimeMillis(),
      schemaJson = Some(StructType(phys.fields.map(f =>
        if (f.name == physN) f.copy(dataType = newType) else f)).json)))
  }

  // --------------------------------------------------------------- write

  /** The stat "kind" of a tracked column — the comparison domain its
    * min/max strings live in. Integral and timestamp values stay EXACT
    * (no double roundtrip: long epoch-nanos lose 256 ns at 1.7e18);
    * strings compare in Spark's UTF8 byte order, not Java UTF-16.
    */
  private def statKind(dt: org.apache.spark.sql.types.DataType): String =
    VersionedTable.statKind(dt)

  /** The column rendered INTO its stat domain (exact per [[statKind]]). */
  private def statValExpr(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp"))
      case _ => col(c)
    }

  /** The column as a DOUBLE for quantile binning ([[compactClustered]]).
    * Strings map to an order-preserving numeric proxy: the first 6 UTF-8
    * bytes read as a big-endian integer (zero-padded, so prefixes sort
    * before their extensions exactly as UTF8 byte order does). 48 bits is
    * exact in a double and far exceeds the ~4 bits of resolution a bin
    * needs; strings sharing a 6-byte prefix share a bin, which only
    * coarsens clustering, never correctness — the dir stats stay the TRUE
    * string min/max ([[statValExpr]]), compared in UTF8 order by
    * [[candidateDirs]].
    */
  private def clusterValExpr(df: DataFrame, c: String): Column =
    if (statKind(df.schema(c).dataType) == "str")
      conv(hex(call_function("rpad",
        substring(encode(col(c).cast("string"), "UTF-8"), 1, 6),
        lit(6), lit(Array[Byte](0)))), 16, 10).cast("double")
    else statValExpr(df, c).cast("double")

  /** Write one data dir, collecting the row count AND per-column min/max
    * and null counts DURING the write via `observe` — zero extra scan per
    * commit. The row count feeds the manifest's per-dir row ledger
    * ([[metadataCount]]); null counts feed IS NULL / IS NOT NULL pruning
    * ([[skipDirsFor]]) and [[metadataNullCount]]. When the table tracks
    * [[bloomCols]], each gets a per-dir bloom sidecar built from a
    * columnar readback of the freshly-written dir (that scan reads only
    * the bloom columns).
    */
  /** The ONE stats-ledger aggregate shape — `__rows` plus per tracked
    * column min/max in the stat domain and the non-null count — shared by
    * the observe-based write path ([[writeData]]), the file-grain sidecar
    * ([[writeFileStats]]), and the streaming-adoption readback
    * ([[adoptFiles]]), so the three ledgers can never drift in
    * comparison semantics.
    */
  private def ledgerAggs(df: DataFrame, present: Seq[String]): Seq[Column] =
    count(lit(1)).as("__rows") +: present.flatMap { c =>
      val e = statValExpr(df, c)
      Seq(min(e).as(s"__mn_$c"), max(e).as(s"__mx_$c"),
        count(e).as(s"__nn_$c")) // count(e) = non-null rows
    }

  private def writeData(df: DataFrame, version: Long): DirWrite = {
    val dir = f"data/c$version%010d-${java.util.UUID.randomUUID().toString.take(8)}"
    val present = physTracked(statsCols).filter(df.columns.contains)
    val bloomPresent = physTracked(bloomCols).filter(df.columns.contains)
    val obs = new org.apache.spark.sql.Observation(
      s"vt_stats_${java.util.UUID.randomUUID().toString.take(8)}")
    val aggs = ledgerAggs(df, present)
    val toWrite = df.observe(obs, aggs.head, aggs.tail: _*)
    toWrite.write.mode("overwrite").option("compression", "zstd")
      .parquet(new Path(rootPath, dir).toString)
    val row = obs.get
    val rows = row.get("__rows").map(_.asInstanceOf[Long]).getOrElse(0L)
    val stats = Some(row).filter(_ => present.nonEmpty).map { row =>
      val cols = present.flatMap { c =>
        (row.get(s"__mn_$c"), row.get(s"__mx_$c")) match {
          case (Some(mn), Some(mx)) if mn != null && mx != null =>
            Some(c -> ColStats(mn.toString, mx.toString,
              statKind(df.schema(c).dataType)))
          case _ => None
        }
      }.toMap
      // a dir with zero rows can be skipped for ANY predicate; without the
      // marker its missing column stats would make it a forever-candidate
      if (row.get("__rows").contains(0L))
        cols + (rowsMarker -> ColStats("0", "0", "rows"))
      else cols
    }.filter(_.nonEmpty).map(s => Map(dir -> s)).getOrElse(Map.empty)
    val nulls = present.flatMap { c =>
      row.get(s"__nn_$c").map(nn => c -> (rows - nn.asInstanceOf[Long]))
    }.toMap
    if ((bloomPresent.nonEmpty || (fileStats && present.nonEmpty)) && rows > 0) {
      val written = spark.read.schema(df.schema)
        .parquet(new Path(rootPath, dir).toString)
      if (bloomPresent.nonEmpty) writeBlooms(written, dir, bloomPresent, rows)
      if (fileStats && present.nonEmpty) writeFileStats(written, dir, present)
    }
    DirWrite(dir, stats, rows, nulls)
  }

  /** FILE-grain stats sidecar (`_filestats.json`, hidden from parquet
    * listings like the bloom sidecars): per part-file row count, min/max in
    * the stat domain, and null counts of every tracked column, computed in
    * ONE grouped aggregate over a columnar readback of the freshly-written
    * dir (reads only the tracked columns). This is the second level of the
    * metadata pyramid — the tx-log's dir stats prune whole directories
    * ([[skipDirsFor]]), the surviving dirs' sidecars then prune individual
    * part files ([[scanTargetsFor]]) — the same log→manifest-file→data-file
    * layering Iceberg uses, so a narrow predicate on a 1000-file dir opens
    * the handful of files whose range overlaps instead of all of them.
    * Opt-in (`fileStats = true`) because the readback is a per-commit cost
    * on the write path; sidecar-less dirs simply read whole, never wrong.
    */
  private def writeFileStats(written: DataFrame, dir: String,
                             present: Seq[String]): Unit = {
    val aggs = ledgerAggs(written, present)
    val perFile = written
      .groupBy(col("_metadata.file_path").as("__f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect() // bounded: one row per part file
    val node = mapper.createObjectNode()
    val filesNode = node.putObject("files")
    val seen = scala.collection.mutable.Set.empty[String]
    perFile.foreach { r =>
      val fname = new Path(r.getString(0)).getName
      seen += fname
      val o = filesNode.putObject(fname)
      o.put("rows", r.getAs[Long]("__rows"))
      val statsNode = o.putObject("stats")
      val nullsNode = o.putObject("nulls")
      present.foreach { c =>
        (Option(r.getAs[Any](s"__mn_$c")), Option(r.getAs[Any](s"__mx_$c"))) match {
          case (Some(mn), Some(mx)) =>
            val s = statsNode.putObject(c)
            s.put("min", mn.toString)
            s.put("max", mx.toString)
            s.put("kind", statKind(written.schema(c).dataType))
          case _ => ()
        }
        nullsNode.put(c,
          r.getAs[Long]("__rows") - r.getAs[Long](s"__nn_$c"))
      }
    }
    // zero-row part files never appear in the readback groups — record
    // them so the sidecar covers EVERY data file of the dir (the reader's
    // candidate set is the sidecar's key set)
    val dirPath = new Path(rootPath, dir)
    fs.listStatus(dirPath)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).filterNot(seen)
      .foreach(fn => filesNode.putObject(fn).put("rows", 0L))
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node)
    val out = fs.create(new Path(dirPath, fileStatsName), true)
    try out.write(bytes) finally out.close()
  }

  /** Sidecar loads cached per handle (dirs are immutable); None = no
    * sidecar (pre-feature dir, clustered chunk, foreign ref without one).
    */
  private val fileStatsCache =
    scala.collection.concurrent.TrieMap.empty[String, Option[Map[String, FileStat]]]

  private def fileStatsFor(dir: String): Option[Map[String, FileStat]] =
    fileStatsCache.getOrElseUpdate(dir, {
      val p = new Path(new Path(rootPath, dir), fileStatsName)
      try {
        if (!fs.exists(p)) None
        else {
          val node = mapper.readTree(readFully(p))
          val files = node.get("files")
          Some(files.properties().asScala.map { e =>
            val o = e.getValue
            val stats = Option(o.get("stats")).map(_.properties().asScala.map { se =>
              val s = se.getValue
              se.getKey -> ColStats(s.get("min").asText(),
                s.get("max").asText(), s.get("kind").asText())
            }.toMap).getOrElse(Map.empty[String, ColStats])
            val nulls = Option(o.get("nulls")).map(_.properties().asScala.map { ne =>
              ne.getKey -> ne.getValue.asLong()
            }.toMap).getOrElse(Map.empty[String, Long])
            e.getKey -> FileStat(o.get("rows").asLong(), stats, nulls)
          }.toMap)
        }
      } catch { case NonFatal(_) => None } // torn sidecar: read whole, never wrong
    })

  /** Fixed false-positive rate of the per-dir bloom sidecars. At 1% a
    * bloom costs ~1.2 bytes/row — size dirs (or raise fpp) so the sidecar
    * a point lookup loads stays small relative to the dir it can skip.
    */
  private val bloomFpp = 0.01

  /** Build + store one bloom per tracked column over `rows` rows of `src`
    * (the just-written dir, possibly filtered to one chunk). Values hash in
    * their STAT domain ([[statValExpr]]): timestamps as epoch micros, so
    * lookups use the same micros convention as [[readRange]]. Floating /
    * decimal columns are rejected — equality probes on them are
    * ill-defined, same reason parquet has no double bloom in practice.
    */
  private def writeBlooms(src: DataFrame, dir: String,
                          cols: Seq[String], rows: Long): Unit =
    cols.foreach { c =>
      val kind = statKind(src.schema(c).dataType)
      require(kind == "int" || kind == "str",
        s"bloom column $c must be integral, timestamp, or string; " +
          s"got ${src.schema(c).dataType.simpleString}")
      val bf = src.select(statValExpr(src, c).as(c))
        .stat.bloomFilter(c, math.max(rows, 64L), bloomFpp)
      val out = fs.create(
        new Path(new Path(rootPath, dir), s"$bloomPrefix$c.bin"), true)
      try bf.writeTo(out) finally out.close()
    }

  /** Sidecar loads are cached per handle — dirs are immutable, and a
    * missing sidecar (pre-bloom dir, untracked column) is cached as None.
    */
  private val bloomCache = scala.collection.concurrent.TrieMap
    .empty[String, Option[org.apache.spark.util.sketch.BloomFilter]]

  private def bloomFor(dir: String, colName: String): Option[org.apache.spark.util.sketch.BloomFilter] =
    bloomCache.getOrElseUpdate(s"$dir#$colName", {
      val p = new Path(new Path(rootPath, dir), s"$bloomPrefix$colName.bin")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(org.apache.spark.util.sketch.BloomFilter.readFrom(in))
        finally in.close()
      }
    })

  /** Current schema evolved against `incoming` per the enforcement rules:
    * a type conflict always rejects; extra/missing columns reject unless
    * `mergeSchema`, which unions additively (new columns nullable, missing
    * columns null-filled).
    */
  private def targetSchema(incoming: StructType, mergeSchema: Boolean): StructType =
    latestVersion.flatMap(physSchemaOf) match {
      case Some(prev) => evolve(prev, incoming, mergeSchema)
      case None       => incoming
    }

  /** Replace the table contents (CREATE OR REPLACE semantics — the new
    * schema REPLACES the old one, no compatibility check).
    */
  def overwrite(df: DataFrame): Long = {
    validateConstraints(df, "overwrite")
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val w = writeData(df, v)
    commit(Manifest(v, "overwrite", System.currentTimeMillis(), Seq(w.dir),
      w.stats, Some(df.schema.json), dirRows = w.rowsEntry,
      dirNulls = w.nullsEntry))
  }

  /** [[overwrite]] in Spark's BUCKETED layout: the snapshot pre-shuffles
    * into `nBuckets` hash buckets on `bucketCols` (sorted by `sortCols`
    * within each file) at WRITE time, so every later
    * [[readVersionBucketed]] scan reports `HashPartitioning(bucketCols)`
    * and equi-joins/aggregations on those keys plan with NO exchange on
    * this side — the write-once/join-many discipline for a table that is
    * re-joined on the same key every day (the ExactSubstr screen's
    * persisted window index is the canonical case: the index is
    * corpus-scale at 100 TB, and an un-bucketed layout re-shuffles ALL of
    * it on every daily screen).
    *
    * Mechanics: Spark's bucketed writer is the only writer that produces
    * bucket-id-named part files, and it only speaks `saveAsTable` — so the
    * frame stages through a throwaway EXTERNAL table (dropping it keeps
    * the files), the staged dir then renames into the version dir and the
    * manifest commits under the usual optimistic retry. The
    * `repartition(nBuckets, bucketCols)` matches the writer's own bucket
    * hash (murmur3 pmod n), so each task holds exactly one bucket — one
    * file per bucket, the layout that also lets SMJ skip its sort. A
    * `_buckets.json` sidecar in the dir records the spec (underscore
    * prefix: invisible to parquet listings, travels with the dir).
    *
    * Normal reads ([[read]]/[[readVersion]]) see the same rows — bucketed
    * files are plain parquet; only [[readVersionBucketed]] surfaces the
    * partitioning to the planner.
    *
    * Concurrency: with `expectedHead` unset this is an OVERWRITE —
    * last-writer-wins is the semantics, so a commit race retries and the
    * staged frame replaces whatever landed in between (exactly
    * [[overwrite]]'s contract). COMPACTION callers (rewrite-the-head
    * flows: `compactSubstrIndex`, `CALL compact_bucketed`, the CLI
    * compact verbs) must pass `expectedHead` = the version they read:
    * their staged bytes are a function OF that head, so a concurrent
    * commit makes them stale — the commit then fails with
    * [[ConcurrentWriteException]] (single CAS attempt, no silent
    * retry-over) instead of quietly erasing the interleaved commit, the
    * lost-update this parameter exists to prevent. The staged dir a
    * losing attempt leaves under `data/` is unreferenced-orphan debris
    * the vacuum sweep already reclaims past its retention window.
    */
  def overwriteBucketed(df: DataFrame, nBuckets: Int,
                        bucketCols: Seq[String],
                        sortCols: Seq[String] = Seq.empty,
                        expectedHead: Option[Long] = None): Long = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    require(bucketCols.forall(df.columns.contains),
      s"bucket columns ${bucketCols.mkString(",")} must exist in " +
        s"${df.columns.mkString(",")}")
    // the saveAsTable staging path cannot ride the observe-pass sidecar
    // writers, so a handle configured for bloom sidecars or file-grain
    // stats would commit a snapshot WITHOUT them — every point lookup
    // that pruned via bloom/file stats silently degrades to a full scan.
    // Decline loudly; compact()/optimize() carry both.
    require(bloomCols.isEmpty && !fileStats,
      s"overwrite_bucketed does not write bloom sidecars or file-grain " +
        s"stats — on a table configured for them (bloomCols=" +
        s"${bloomCols.mkString(",")}, fileStats=$fileStats) it would be " +
        "a silent skipping regression; use compact()/compactClustered(), " +
        "or bucket through a handle without those configs")
    validateConstraints(df, "overwrite_bucketed")
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(rootPath, s"_staging/bkt-$uuid")
    val tmpTable = s"graft_bktw_$uuid"
    val sorted = if (sortCols.nonEmpty) sortCols else bucketCols
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTable`")
    df.repartition(nBuckets, bucketCols.map(col): _*)
      .write.mode("overwrite").option("compression", "zstd")
      .option("path", staging.toString)
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet").saveAsTable(tmpTable)
    spark.sql(s"DROP TABLE IF EXISTS `$tmpTable`") // external: files stay
    val node = mapper.createObjectNode()
    node.put("nBuckets", nBuckets)
    val bn = node.putArray("bucketCols"); bucketCols.foreach(bn.add)
    val sn = node.putArray("sortCols"); sorted.foreach(sn.add)
    val out = fs.create(new Path(staging, bucketSpecName), true)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsBytes(node))
    finally out.close()
    // ledger stats via readback (the observe pass can't ride saveAsTable).
    // With NO tracked stats columns the only ledger entry needed is the
    // row count — answered from the parquet FOOTERS (driver-side metadata,
    // milliseconds) instead of a full post-write scan job over the bytes
    // just written.
    val present = physTracked(statsCols).filter(df.columns.contains)
    val (rows: Long, dirStats: Map[String, ColStats], dirNulls: Map[String, Long]) =
      if (present.isEmpty) {
        val conf = spark.sparkContext.hadoopConfiguration
        val n = fs.listStatus(staging)
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile
              .fromStatus(st, conf)
            val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try r.getRecordCount finally r.close()
          }.sum
        (n,
          if (n == 0L) Map(rowsMarker -> ColStats("0", "0", "rows"))
          else Map.empty[String, ColStats],
          Map.empty[String, Long])
      } else {
        val written = spark.read.schema(df.schema).parquet(staging.toString)
        val aggs = ledgerAggs(written, present)
        val row = written.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getAs[Long]("__rows")
        val cols = present.flatMap { c =>
          (Option(row.getAs[Any](s"__mn_$c")), Option(row.getAs[Any](s"__mx_$c"))) match {
            case (Some(mn), Some(mx)) =>
              Some(c -> ColStats(mn.toString, mx.toString,
                statKind(written.schema(c).dataType)))
            case _ => None
          }
        }.toMap
        (n,
          if (n == 0L) cols + (rowsMarker -> ColStats("0", "0", "rows")) else cols,
          present.flatMap { c =>
            Option(row.getAs[Any](s"__nn_$c"))
              .map(nn => c -> (n - nn.asInstanceOf[Long]))
          }.toMap)
      }
    var attemptDir: Option[String] = None
    def attemptCommit(v: Long): Long = {
      val relDir = f"data/c$v%010d-$uuid"
      val dst = new Path(rootPath, relDir)
      attemptDir match {
        case None =>
          fs.mkdirs(dst.getParent)
          require(fs.rename(staging, dst),
            s"failed to move bucketed staging $staging into $dst")
        case Some(prev) if prev != relDir =>
          require(fs.rename(new Path(rootPath, prev), dst),
            s"failed to re-version bucketed dir $prev -> $relDir")
        case _ => ()
      }
      attemptDir = Some(relDir)
      commit(Manifest(v, "overwrite_bucketed", System.currentTimeMillis(),
        Seq(relDir),
        if (dirStats.nonEmpty) Map(relDir -> dirStats) else Map.empty,
        Some(df.schema.json), dirRows = Map(relDir -> rows),
        dirNulls =
          if (dirNulls.nonEmpty) Map(relDir -> dirNulls) else Map.empty))
    }
    expectedHead match {
      case Some(h) =>
        // compaction CAS: the staged frame was computed from head `h`; a
        // head that moved means a commit interleaved and the rewrite is
        // stale — one attempt at exactly h+1. BOTH failure spellings (a
        // pre-check miss here, a lost fails-if-exists rename inside
        // commit) throw ConcurrentWriteException, the engine's one
        // conflict-retry signal, so a caller's retry wrapper re-runs the
        // whole read-restage-commit cycle.
        if (!latestVersion.contains(h))
          throw new ConcurrentWriteException(
            s"expectedHead $h is not the latest version at $root " +
              s"(latest: $latestVersion) — a commit interleaved; " +
              "re-read and restage the rewrite", null)
        attemptCommit(h + 1)
      case None =>
        withConflictRetry() {
          attemptCommit(latestVersion.map(_ + 1).getOrElse(0L))
        }
    }
  }

  /** Rewrite ONE committed snapshot into the bucketed layout — the
    * COMPACTION spelling of [[overwriteBucketed]] with the CAS
    * discipline built in: reads version `at` (default: the current
    * head), commits at `at + 1`, and throws
    * [[ConcurrentWriteException]] when `at` is no longer the head (a
    * commit interleaved between the read and this rewrite — re-read and
    * re-run; [[withConflictRetry]] composes). Callers that already
    * validated a specific pin (the CLI's stamped-pin check) pass it as
    * `at`, closing the re-read-the-head TOCTOU window.
    */
  def rebucket(nBuckets: Int, bucketCols: Seq[String],
               sortCols: Seq[String] = Seq.empty,
               at: Option[Long] = None): Long = {
    val head = at.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"nothing to rebucket at $root"))
    overwriteBucketed(readVersion(head), nBuckets, bucketCols, sortCols,
      expectedHead = Some(head))
  }

  /** Bucket layout of version `v`, when the planner can exploit it: the
    * version must be exactly ONE [[overwriteBucketed]]-written dir with no
    * live deletion vectors and no column-mapping overlay (either would
    * force a rewrite the bucket metadata doesn't describe). Returns
    * (nBuckets, bucketCols, sortCols, absolute dir).
    */
  /** Content-addressed catalog name of a bucketed dir's registration —
    * shared by [[readVersionBucketed]] (create) and [[vacuumKeeping]]
    * (retire with the dir). */
  private def bucketRegName(absDir: String): String =
    "graft_bkt_" + java.security.MessageDigest.getInstance("MD5")
      .digest(absDir.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(16)

  /** Retire the catalog registration of a deleted bucketed dir (primary
    * cleanup, on the vacuum path — O(1) per deleted dir; the cold-read
    * sweep in [[readVersionBucketed]] is the fallback for out-of-band
    * deletions). Registration names resolve in the creating session's
    * current database; a miss is fine — the fallback sweep covers it. */
  private def dropBucketReg(absDir: String): Unit = {
    val cat = spark.sessionState.catalog
    scala.util.Try(cat.dropTable(
      org.apache.spark.sql.catalyst.TableIdentifier(bucketRegName(absDir)),
      ignoreIfNotExists = true, purge = false))
    ()
  }

  def bucketSpecOf(v: Long): Option[(Int, Seq[String], Seq[String], String)] = {
    val m = manifest(v)
    if (m.dataDirs.size != 1 || m.dvs.nonEmpty || m.colMap.nonEmpty) None
    else {
      val dir = new Path(rootPath, m.dataDirs.head)
      val p = new Path(dir, bucketSpecName)
      if (!fs.exists(p)) None
      else {
        val node = mapper.readTree(readFully(p))
        import scala.jdk.CollectionConverters._
        Some((node.get("nBuckets").asInt(),
          node.get("bucketCols").elements().asScala.map(_.asText()).toSeq,
          node.get("sortCols").elements().asScala.map(_.asText()).toSeq,
          dir.toString))
      }
    }
  }

  /** [[readVersion]] that SURFACES a bucketed version's layout to the
    * planner: when [[bucketSpecOf]] says version `v` is one bucketed dir,
    * the read goes through a catalog registration (Spark only honors
    * bucketing through catalog table scans), so the scan reports
    * `HashPartitioning(bucketCols, nBuckets)` and downstream joins/aggs
    * on the bucket keys add no exchange above it. Falls back to the plain
    * [[readVersion]] for every other shape — same rows either way, this
    * method only changes the PLAN. The registration name is
    * content-addressed by the DATA DIR's full path (which embeds the
    * commit's uuid), not by (root, version): a root that is deleted and
    * rebuilt re-mints version numbers over fresh dirs, and a
    * (root, version)-keyed entry would silently point a later read at
    * the vanished old location. Dir paths are globally unique, so the
    * registration is idempotent and a stale entry can never be reused
    * for different bytes.
    */
  def readVersionBucketed(v: Long): DataFrame = bucketSpecOf(v) match {
    case None => readVersion(v)
    case Some((n, bCols, sCols, dir)) =>
      val schema = schemaOf(v).getOrElse(
        spark.read.parquet(dir).schema)
      val tbl = bucketRegName(dir)
      if (!spark.catalog.tableExists(tbl)) {
        // FALLBACK registry sweep, on the COLD path only (once per new
        // bucketed dir — one nightly compact in production, never per
        // read): the PRIMARY retirement is [[vacuumKeeping]] dropping a
        // dir's registration as it deletes the dir; this sweep catches
        // out-of-band deletions (rm -rf, a different session's vacuum,
        // a clone root removed). Direct session-catalog calls — the SQL
        // spellings would run one job per sibling registration. The
        // existence probe resolves each location's OWN filesystem (a
        // shared metastore can hold registrations on other schemes) and
        // a probe that throws keeps the entry.
        val cat = spark.sessionState.catalog
        cat.listTables(cat.getCurrentDatabase, "graft_bkt_*").foreach { id =>
          val gone = scala.util.Try {
            val p = new Path(cat.getTableMetadata(id).location)
            !p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .exists(p)
          }.getOrElse(false)
          if (gone) cat.dropTable(id, ignoreIfNotExists = true, purge = false)
        }
        spark.sql(
          s"CREATE TABLE IF NOT EXISTS `$tbl` (${schema.toDDL}) " +
            s"USING parquet " +
            s"CLUSTERED BY (${bCols.map(c => s"`$c`").mkString(", ")}) " +
            s"SORTED BY (${sCols.map(c => s"`$c`").mkString(", ")}) " +
            s"INTO $n BUCKETS LOCATION '$dir'")
      }
      // DDL round-trips drop field metadata; re-attach the manifest
      // schema's (e.g. the ExactSubstr index's window stamp) — a Project
      // of aliases, which preserves the scan's output partitioning
      spark.table(tbl).select(schema.fields.toSeq.map(f =>
        col(s"`${f.name}`").as(f.name, f.metadata)): _*)
  }

  /** Latest-version [[readVersionBucketed]]. */
  def readBucketed(): DataFrame = readVersionBucketed(
    latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root")))

  /** Add rows without touching existing files (blind append — no read, no
    * shuffle of existing data; the cheap path for bronze run ingestion).
    * Prior dirs keep their recorded stats (files are immutable).
    *
    * Schema is ENFORCED against the committed table schema: a frame with a
    * conflicting column type, or (without `mergeSchema`) extra/missing
    * columns, throws [[SchemaMismatchException]] at commit time instead of
    * corrupting reads later. `mergeSchema = true` opts into additive
    * evolution: new columns append (nullable), old data dirs read them as
    * null via the manifest schema.
    */
  def append(df: DataFrame, mergeSchema: Boolean = false,
             operation: String = "append"): Long = {
    validateConstraints(df, "append")
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val prevM = latestVersion.map(manifest)
    val prev = prevM.map(_.dataDirs).getOrElse(Seq.empty)
    // user frame (logical names) → physical slots; NEW columns claim fresh
    // slots and extend the overlay, dropped slots re-align as nulls
    val (physDf, addedPairs) = prevM match {
      case Some(m) if m.colMap.nonEmpty =>
        val mp = logToPhys(m)
        val pairs = df.columns.toSeq.map(c =>
          (mp.getOrElse(c, freshPhysName(m, c, v)), c))
        (withDroppedNulls(m,
          df.select(pairs.map { case (p, l) => col(l).as(p) }: _*)),
          pairs.filterNot { case (_, l) => mp.contains(l) })
      case _ => (df, Seq.empty[(String, String)])
    }
    val target = targetSchema(physDf.schema, mergeSchema)
    val w = writeData(align(physDf, target), v)
    commit(Manifest(v, operation, System.currentTimeMillis(), prev :+ w.dir,
      prevM.map(_.stats).getOrElse(Map.empty) ++ w.stats, Some(target.json),
      prevM.map(_.dvs).getOrElse(Nil),
      prevM.map(_.dirRows).getOrElse(Map.empty) + (w.dir -> w.rows),
      prevM.map(_.dirNulls).getOrElse(Map.empty) ++ w.nullsEntry,
      colMap = prevM.map(m =>
        if (m.colMap.isEmpty) Seq.empty[(String, String)]
        else m.colMap ++ addedPairs).getOrElse(Nil)))
  }

  /** Adopt EXECUTOR-WRITTEN parquet part files (the DSv2 streaming-write
    * path: tasks write rows straight to staging with Spark's parquet
    * writer — no driver round-trip) into one committed data dir. One
    * columnar readback computes the stats/rows/nulls ledger the normal
    * write path gathers via `observe`; the files then MOVE (rename, no
    * copy) into a version-named dir and the manifest commits under the
    * usual optimistic retry — on a conflict the dir renames to the next
    * version's name and the commit replays (blind-append semantics, like
    * [[appendRetrying]]). Declines on mapped tables (staged files carry
    * the query's logical names; the overlay would mis-slot them).
    */
  private[sources] def adoptFiles(staged: Seq[String], operation: String,
                                  mergeSchema: Boolean = false): Long = {
    require(staged.nonEmpty, "no files to adopt")
    val readBack = spark.read.parquet(staged: _*)
    validateConstraints(readBack, operation)
    val present = physTracked(statsCols).filter(readBack.columns.contains)
    val aggs = ledgerAggs(readBack, present)
    val row = readBack.agg(aggs.head, aggs.tail: _*).head()
    val rows = row.getAs[Long]("__rows")
    val dirStats: Map[String, ColStats] = {
      val cols = present.flatMap { c =>
        (Option(row.getAs[Any](s"__mn_$c")), Option(row.getAs[Any](s"__mx_$c"))) match {
          case (Some(mn), Some(mx)) =>
            Some(c -> ColStats(mn.toString, mx.toString,
              statKind(readBack.schema(c).dataType)))
          case _ => None
        }
      }.toMap
      if (rows == 0L) cols + (rowsMarker -> ColStats("0", "0", "rows")) else cols
    }
    val dirNulls: Map[String, Long] = present.flatMap { c =>
      Option(row.getAs[Any](s"__nn_$c"))
        .map(nn => c -> (rows - nn.asInstanceOf[Long]))
    }.toMap
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    var attemptDir: Option[String] = None
    withConflictRetry() {
      val v = latestVersion.map(_ + 1).getOrElse(0L)
      val relDir = f"data/c$v%010d-$uuid"
      val dst = new Path(rootPath, relDir)
      attemptDir match {
        case None =>
          fs.mkdirs(dst)
          staged.foreach { f =>
            val src = new Path(f)
            require(fs.rename(src, new Path(dst, src.getName)),
              s"failed to move staged file $f into $dst")
          }
        case Some(prev) if prev != relDir =>
          require(fs.rename(new Path(rootPath, prev), dst),
            s"failed to re-version adopted dir $prev -> $relDir")
        case _ => ()
      }
      attemptDir = Some(relDir)
      val prevM = latestVersion.map(manifest)
      // both checks run INSIDE the retry against the THEN-CURRENT
      // snapshot: a concurrent commit may have evolved the schema or
      // activated a mapping overlay between attempts — a stale check
      // would silently erase the overlay or commit a drifted schema
      require(!prevM.exists(_.colMap.nonEmpty),
        s"streaming write requires an unmapped table at $root " +
          "(a rename/drop overlay is active); use foreachBatch + append")
      val target = targetSchema(readBack.schema, mergeSchema)
      require(readBack.schema.fieldNames.toSeq == target.fieldNames.toSeq,
        s"adopted files' physical column order ${readBack.columns.mkString(",")} " +
          s"must match the committed order ${target.fieldNames.mkString(",")}")
      commit(Manifest(v, operation, System.currentTimeMillis(),
        prevM.map(_.dataDirs).getOrElse(Nil) :+ relDir,
        prevM.map(_.stats).getOrElse(Map.empty) ++
          (if (dirStats.nonEmpty) Map(relDir -> dirStats) else Map.empty),
        Some(target.json),
        prevM.map(_.dvs).getOrElse(Nil),
        prevM.map(_.dirRows).getOrElse(Map.empty) + (relDir -> rows),
        prevM.map(_.dirNulls).getOrElse(Map.empty) ++
          (if (dirNulls.nonEmpty) Map(relDir -> dirNulls) else Map.empty)))
    }
  }

  /** Highest batch/epoch `queryId` is known to have committed into this
    * table — the max of the live manifests' `stream_append:<qid>:<n>`
    * entries and the per-query SIDECAR under the tx log. The sidecar is
    * what makes the streaming exactly-once guarantee survive [[vacuum]]:
    * retention drops old manifests (and their ledger entries) but never
    * touches `_txlog/_stream/`, so a checkpoint-recovery replay after an
    * aggressive vacuum still sees the committed watermark.
    */
  private[sources] def streamLedgerGet(queryId: String): Option[Long] = {
    val pref = s"stream_append:$queryId:"
    val fromManifests = versions.flatMap { v =>
      val op = manifest(v).operation
      if (op.startsWith(pref)) op.stripPrefix(pref).toLongOption else None
    }.maxOption
    (fromManifests.toSeq ++ streamLedgerSidecar(queryId)).maxOption
  }

  /** The sidecar component of [[streamLedgerGet]] alone (no manifest
    * scan) — [[vacuumKeeping]] compares against it while the manifests it
    * is about to drop are still live.
    */
  private def streamLedgerSidecar(queryId: String): Option[Long] = {
    val p = streamLedgerPath(queryId)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption
      finally in.close()
    }
  }

  /** Record `batchId` as committed by `queryId` (called AFTER the table
    * commit — a crash in between is covered by the manifest entry until
    * a vacuum, the sidecar thereafter). Atomic overwrite via temp+rename.
    */
  private[sources] def streamLedgerPut(queryId: String, batchId: Long): Unit = {
    val dir = new Path(logPath, "_stream")
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-$queryId-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      rootPath.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, streamLedgerPath(queryId),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def streamLedgerPath(queryId: String): Path =
    new Path(logPath, s"_stream/$queryId")

  /** [[append]] wrapped in the optimistic-concurrency retry loop every
    * multi-writer deployment needs: on [[ConcurrentWriteException]] the
    * version is recomputed from the refreshed log and the append replays
    * (a blind append commutes with whatever the winner committed, so the
    * retry is always semantically safe — do NOT wrap reads-then-writes
    * like merge this way without revalidating what was read). The losing
    * attempt's data dir is orphaned and collected by [[vacuum]]'s
    * retention-windowed orphan sweep.
    */
  def appendRetrying(df: DataFrame, mergeSchema: Boolean = false,
                     maxAttempts: Int = 5,
                     operation: String = "append"): Long =
    withConflictRetry(maxAttempts)(append(df, mergeSchema, operation))

  /** Optimistic-concurrency retry for READ-MODIFY-WRITE operations —
    * the other half of the multi-writer story next to [[appendRetrying]]
    * (whose blind replay is safe ONLY for appends). Each attempt runs
    * `op` FROM SCRATCH: every table operation re-reads the then-current
    * snapshot when invoked, so a recomputed attempt is a fresh
    * serializable transaction against the winner's result — exactly
    * Delta's retry-the-transaction model, with the conservative conflict
    * rule (any concurrent commit ⇒ recompute; no attempt to prove
    * disjoint-file commutativity, which is the documented optimization
    * lever for compaction-vs-append races). Only
    * [[ConcurrentWriteException]] retries — a permissions/disk failure
    * propagates as itself. Losing attempts' data dirs are orphaned and
    * collected by [[vacuum]]'s retention-windowed sweep.
    */
  def withConflictRetry[T](maxAttempts: Int = 5)(op: => T): T = {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: ConcurrentWriteException =>
          if (attempt >= maxAttempts) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** [[merge]] under [[withConflictRetry]]: each attempt re-discovers
    * matched dirs and recomputes winners against the then-current
    * snapshot, so retrying after a concurrent commit is serializable —
    * the multi-writer upsert every CDC sink needs.
    */
  def mergeRetrying(updates: DataFrame, keyCols: Seq[String],
                    orderCol: String, mergeSchema: Boolean = false,
                    deleteWhen: Option[Column] = None,
                    deleteNotMatchedBySource: Option[Column] = None,
                    maxAttempts: Int = 5): Long =
    withConflictRetry(maxAttempts)(merge(updates, keyCols, orderCol,
      mergeSchema, deleteWhen, deleteNotMatchedBySource))

  /** [[delete]] under [[withConflictRetry]] — recompute semantics as in
    * [[mergeRetrying]].
    */
  def deleteRetrying(predicate: Column,
                     useDeletionVectors: Boolean = false,
                     maxAttempts: Int = 5): Long =
    withConflictRetry(maxAttempts)(delete(predicate, useDeletionVectors))

  /** [[update]] under [[withConflictRetry]] — recompute semantics as in
    * [[mergeRetrying]]; the execution target of SQL-text `UPDATE`.
    */
  def updateRetrying(predicate: Column, assignments: Map[String, Column],
                     maxAttempts: Int = 5): Long =
    withConflictRetry(maxAttempts)(update(predicate, assignments))

  /** Transactional upsert (MERGE INTO … WHEN MATCHED UPDATE, WHEN NOT
    * MATCHED INSERT, and — with `deleteWhen` — WHEN MATCHED AND cond
    * DELETE): one row per `keyCols` survives, ordered by `orderCol`
    * descending; on an exact `orderCol` tie the UPDATES side wins
    * (matched-update semantics), and remaining ties — duplicate keys
    * WITHIN the updates frame at the same `orderCol` — break on the
    * remaining columns' values, so the winner is fully deterministic
    * (requires orderable column types; pre-collapse the frame yourself if
    * it carries maps).
    *
    * `deleteWhen` is evaluated per UPDATES row (null → false): when the
    * winning row for a key is a delete-flagged update, the key is removed
    * from the snapshot (for an unmatched key that is a no-op insert —
    * exactly WHEN MATCHED DELETE). Schema enforcement as in [[append]].
    *
    * `deleteNotMatchedBySource` is the third Delta arm (WHEN NOT MATCHED
    * BY SOURCE AND cond THEN DELETE — sync semantics): TABLE rows whose
    * key has no updates row AND whose cond is TRUE (null → keep, SQL
    * DELETE rules) are removed. The cond also SCOPES the extra discovery:
    * only dirs that can hold cond-true rows (stats-pruned, then exact)
    * join the rewrite, so a sync over "this month's partition" doesn't
    * rewrite years of history. Null-keyed table rows never match any
    * source row (SQL equality), so they are eligible for this arm.
    *
    * Dir-grained copy-on-write, same discipline as [[delete]]: ONE
    * key-column semi-join discovers the data dirs that contain matched
    * keys (parquet column pruning means that scan reads only the key
    * columns); only those dirs join the merge rewrite. Matched-key winners
    * and not-matched inserts land together in one new dir; untouched dirs
    * — including Z-order chunk subdirs — carry into the new version with
    * their skipping stats intact. A MERGE touching 0.1% of keys on an
    * append-mostly table therefore rewrites a few dirs, not the table,
    * and post-OPTIMIZE clustering survives narrow merges.
    */
  def merge(updates: DataFrame, keyCols: Seq[String], orderCol: String,
            mergeSchema: Boolean = false,
            deleteWhen: Option[Column] = None,
            deleteNotMatchedBySource: Option[Column] = None): Long = {
    validateConstraints(updates, "merge")
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    // column mapping: translate every user-facing input (frame columns,
    // keys, order, predicates) into physical space once, up front — the
    // discovery/rewrite below runs entirely against physical frames.
    // Identity (and zero-cost) until a rename/drop activates the overlay.
    val curM = latestVersion.map(manifest)
    val mapActive = curM.exists(_.colMap.nonEmpty)
    val mp = if (mapActive) logToPhys(curM.get) else Map.empty[String, String]
    val updPairs: Seq[(String, String)] =
      if (!mapActive) Nil
      else updates.columns.toSeq.map(c =>
        (mp.getOrElse(c, freshPhysName(curM.get, c, v)), c))
    val updatesP =
      if (!mapActive) updates
      else withDroppedNulls(curM.get,
        updates.select(updPairs.map { case (p, l) => col(l).as(p) }: _*))
    val addedPairs = updPairs.filterNot { case (_, l) => mp.contains(l) }
    val keyColsP = if (!mapActive) keyCols else keyCols.map(physName(curM.get, _))
    val orderColP = if (!mapActive) orderCol else physName(curM.get, orderCol)
    val deleteWhenP =
      if (!mapActive) deleteWhen else deleteWhen.map(toPhysicalCol(curM.get, _))
    val nmbsPredP = if (!mapActive) deleteNotMatchedBySource
      else deleteNotMatchedBySource.map(toPhysicalCol(curM.get, _))
    // null-keyed rows NEVER match under SQL equality, but a bare
    // Window.partitionBy(keyCols) groups nulls together (GROUP BY
    // semantics) and would silently collapse distinct null-keyed rows to
    // one winner. A per-row salt on exactly those rows puts each in its
    // own window partition — one pass, no second scan of the rewritten
    // dirs — while keyed rows keep the normal winner semantics.
    val anyNullKey = keyColsP.map(col(_).isNull).reduce(_ || _)
    def resolveWinners(df: DataFrame, withSrc: Boolean): DataFrame = {
      val valueTies = df.columns
        .filter(c => !keyColsP.contains(c) && c != orderColP && c != "_vt_src")
        .map(col(_).desc).toSeq
      val order = (col(orderColP).desc_nulls_last +:
        (if (withSrc) Seq(col("_vt_src").desc) else Nil)) ++ valueTies
      val salt = when(anyNullKey, monotonically_increasing_id())
        .otherwise(lit(0L))
      val w = Window.partitionBy(keyColsP.map(col) :+ salt: _*)
        .orderBy(order: _*)
      val drops = if (withSrc) Seq("_vt_src") else Nil
      df.withColumn("_vt_rn", row_number().over(w))
        .filter(col("_vt_rn") === 1).drop("_vt_rn")
        .drop(drops: _*)
        .filter(!col("_vt_del")).drop("_vt_del")
    }
    val delFlag = deleteWhenP.map(c => coalesce(c, lit(false)))
      .getOrElse(lit(false))
    latestVersion match {
      case None =>
        val upd = align(updates, updates.schema, Seq(delFlag.as("_vt_del")))
        val kept = resolveWinners(upd, withSrc = false)
        val w = writeData(kept, v)
        commit(Manifest(v, "merge", System.currentTimeMillis(), Seq(w.dir),
          w.stats, Some(updates.schema.json), dirRows = w.rowsEntry,
          dirNulls = w.nullsEntry))
      case Some(cur) =>
        val m = manifest(cur)
        val tgt = targetSchema(updatesP.schema, mergeSchema)
        // discovery job: which dirs hold rows whose key appears in the
        // updates? When the (single) merge key is a tracked stats column,
        // the updates' key min/max first prunes the discovery scan to the
        // overlapping dirs (one tiny agg on the updates buys skipping the
        // bulk of an append-mostly table); the semi-join then reads key
        // columns only, and AQE broadcasts a small key set.
        // `_metadata.file_path` (not input_file_name) because the updates
        // frame may be file-backed too — the plan then has two sources and
        // input_file_name refuses to bind; _metadata is per-relation.
        val scanDirs: Seq[String] =
          if (keyColsP.size == 1 && physTracked(statsCols).contains(keyColsP.head)) {
            val k = keyColsP.head
            val r = updatesP.select(min(statValExpr(updatesP, k)).as("lo"),
              max(statValExpr(updatesP, k)).as("hi")).head()
            if (r.isNullAt(0)) Seq.empty // no non-null keys → nothing matches
            else candidateDirs(cur, k, r.get(0), r.get(1))
          } else m.dataDirs
        // semi/anti probes don't need a deduplicated build side — the
        // DISTINCT only pays in the tblFlagged LEFT join below (where
        // duplicate keys would fan table rows out), so the discovery
        // probes take the raw projection and skip that exchange
        val keysRaw = updatesP.select(keyColsP.map(col): _*)
        lazy val keys = keysRaw.distinct()
        val dirPattern = s"(data/c[0-9]{10}-[0-9a-f]{8}(?:/$chunkCol=[0-9]+)?)"
        // NOTE (r16): a "skip discovery when ONE candidate dir" short-
        // circuit was tried and REVERTED — it breaks the no-match append
        // contract (an insert-only merge must never rewrite untouched
        // data; the streaming upsert sink's fragmentation + auto-compaction
        // amortization depends on it, StreamUpsertSpec). The discovery job
        // is instead kept THIN: no build-side distinct, and the dir-name
        // dedup folds into one collect_set aggregate instead of a
        // distinct + collect round-trip.
        val matchedDirs =
          if (scanDirs.isEmpty) Set.empty[String]
          else readDirsWithPos(m, scanDirs)
            .select(col(dvFileCol) +: keyColsP.map(col): _*)
            .join(keysRaw, keyColsP, "left_semi")
            .agg(collect_set(
              regexp_extract(col(dvFileCol), dirPattern, 1)).as("d"))
            .head().getSeq[String](0).toSet // bounded: dir names
        // the sync arm's extra discovery: dirs holding rows where the cond
        // is TRUE and the key has no updates row — stats-pruned by the
        // cond first (skipDirsFor), then exact, anti-joined on the keys
        val nmbs = nmbsPredP.map(c => coalesce(c, lit(false)))
        val nmbsDirs: Set[String] = nmbs match {
          case None => Set.empty
          case Some(p) =>
            // prune on the RAW cond — the extractor can't see through the
            // coalesce wrapper, and TRUE-satisfiability of
            // coalesce(c, false) is exactly that of c. skipDirsFor takes
            // the ORIGINAL (logical-name) cond; it owns the translation.
            val scope = skipDirsFor(cur, deleteNotMatchedBySource.get)
            if (scope.isEmpty) Set.empty
            else readDirsWithPos(m, scope).filter(p)
              .join(keysRaw, keyColsP, "left_anti")
              .agg(collect_set(
                regexp_extract(col(dvFileCol), dirPattern, 1)).as("d"))
              .head().getSeq[String](0).toSet // bounded
        }
        val hitDirs = matchedDirs ++ nmbsDirs
        val keep = m.dataDirs.filterNot(d => matchesToken(d, hitDirs))
        val hit = m.dataDirs.filter(d => matchesToken(d, hitDirs))
        val upd = align(updatesP, tgt,
          Seq(lit(1).as("_vt_src"), delFlag.as("_vt_del")))
        val unioned = if (hit.isEmpty) upd else {
          val tblRaw = readDirsOf(m, hit)
          // table rows delete under the sync arm only when key-unmatched
          // AND cond-true; the matched marker comes from one left join
          // against the (small, AQE-broadcast) distinct key set
          val tblFlagged = nmbs match {
            case None => tblRaw.withColumn("_vt_del0", lit(false))
            case Some(p) =>
              tblRaw.join(keys.withColumn("_vt_mk", lit(1)), keyColsP.toSeq, "left")
                .withColumn("_vt_del0", p && col("_vt_mk").isNull)
                .drop("_vt_mk")
          }
          align(tblFlagged, tgt,
            Seq(lit(0).as("_vt_src"), col("_vt_del0").as("_vt_del")))
            .unionAll(upd)
        }
        val kept = resolveWinners(unioned, withSrc = true)
        // cluster the rewritten dir by the tracked columns: the merge has
        // already paid its shuffle, so an in-partition sort is marginal —
        // and it is what makes parquet row-group stats selective INSIDE
        // the new dir (dir-grain min/max only prune whole dirs)
        val sortCols = physTracked(statsCols).filter(kept.columns.contains)
        val clustered = if (sortCols.isEmpty) kept
          else kept.sortWithinPartitions(sortCols.map(col): _*)
        val w = writeData(clustered, v)
        commit(Manifest(v, "merge", System.currentTimeMillis(), keep :+ w.dir,
          m.stats.view.filterKeys(keep.contains).toMap ++ w.stats,
          Some(tgt.json), m.dvs,
          m.dirRows.view.filterKeys(keep.contains).toMap + (w.dir -> w.rows),
          m.dirNulls.view.filterKeys(keep.contains).toMap ++ w.nullsEntry,
          colMap = if (m.colMap.isEmpty) Nil else m.colMap ++ addedPairs))
    }
  }

  /** Row-level DELETE (DELETE FROM … WHERE predicate). Rows where the
    * predicate is true are removed; null evaluates to false (SQL DELETE
    * keeps the row). Time travel to pre-delete versions keeps working
    * until [[vacuum]].
    *
    * Two physical strategies, the same trade Delta exposes:
    *
    *  - copy-on-write (default): ONE discovery job finds the data dirs
    *    containing matching rows, only those rewrite — untouched dirs (and
    *    their stats) carry as-is, so a narrow delete rewrites a few dirs,
    *    not the table.
    *  - merge-on-read (`useDeletionVectors = true`): no data rewrite at
    *    all — the matched (file, row_index) positions are written as a
    *    deletion-vector parquet under `dv/` and referenced from the
    *    manifest; every read anti-joins them out. DELETE cost becomes
    *    O(matched rows) regardless of how many dirs the matches straddle —
    *    the right mode when deletes are scattered (GDPR-style per-row
    *    erasure across an entire 100 TB table). Reads pay the (broadcast)
    *    anti-join until a rewrite of the affected dirs — [[compact]] /
    *    [[compactClustered]] materialize ALL DVs away, and any CoW
    *    merge/delete/update materializes them for the dirs it rewrites.
    *    Dir min/max stats and bloom sidecars still describe the physical
    *    files, so skipping stays conservative (never wrong) over DV'd
    *    rows.
    */
  def delete(predicate: Column, useDeletionVectors: Boolean = false): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val v = cur + 1
    val m = manifest(cur)
    val pred = coalesce(toPhysicalCol(m, predicate), lit(false))
    if (useDeletionVectors) {
      val dvDir = f"dv/v$v%010d-${java.util.UUID.randomUUID().toString.take(8)}"
      val obs = new org.apache.spark.sql.Observation(
        s"vt_dv_${java.util.UUID.randomUUID().toString.take(8)}")
      readDirsWithPos(m, m.dataDirs).filter(pred)
        .select(col(dvFileCol), col(dvRowCol))
        .observe(obs, count(lit(1)).as("__rows"))
        .write.mode("overwrite").parquet(new Path(rootPath, dvDir).toString)
      val matched = obs.get("__rows").asInstanceOf[Long]
      if (matched == 0L) {
        fs.delete(new Path(rootPath, dvDir), true)
        return commit(m.copy(version = v, operation = "delete",
          timestampMs = System.currentTimeMillis()))
      }
      return commit(Manifest(v, "delete_dv", System.currentTimeMillis(),
        m.dataDirs, m.stats, m.schemaJson, m.dvs :+ dvDir, m.dirRows,
        colMap = m.colMap))
    }
    // ONE data dir with a known row ledger and no live DVs: discovery
    // cannot prune below dir grain, so fuse it into the rewrite — write
    // the survivors in the same pass and read "nothing matched" off the
    // ledger (rows written == rows before). The no-match case still
    // commits METADATA-ONLY (the staged dir is discarded), identical to
    // the two-pass path's semantics; multi-dir tables keep full discovery.
    if (m.dataDirs.size == 1 && m.dvs.isEmpty &&
        m.dataDirs.forall(m.dirRows.contains)) {
      val total = m.dataDirs.flatMap(m.dirRows.get).sum
      val w = writeData(readDirsOf(m, m.dataDirs).filter(!pred), v)
      if (w.rows == total) {
        fs.delete(new Path(rootPath, w.dir), true)
        return commit(m.copy(version = v, operation = "delete",
          timestampMs = System.currentTimeMillis()))
      }
      return commit(Manifest(v, "delete", System.currentTimeMillis(),
        Seq(w.dir), w.stats, m.schemaJson, m.dvs, dirRows = w.rowsEntry,
        dirNulls = w.nullsEntry, colMap = m.colMap))
    }
    // a clustered commit's data dirs are chunk SUBdirs — the extractor must
    // keep the =N suffix or hit dirs would never match the manifest entries
    val hitDirs = readDirsWithPos(m, m.dataDirs).filter(pred)
      .select(regexp_extract(col(dvFileCol),
        s"(data/c[0-9]{10}-[0-9a-f]{8}(?:/$chunkCol=[0-9]+)?)", 1).as("d"))
      .distinct().collect().map(_.getString(0)).toSet // bounded: dir names
    if (hitDirs.isEmpty)
      return commit(m.copy(version = v, operation = "delete",
        timestampMs = System.currentTimeMillis()))
    val keep = m.dataDirs.filterNot(d => matchesToken(d, hitDirs))
    val hit = m.dataDirs.filter(d => matchesToken(d, hitDirs))
    val survivors = readDirsOf(m, hit).filter(!pred)
    val w = writeData(survivors, v)
    commit(Manifest(v, "delete", System.currentTimeMillis(), keep :+ w.dir,
      m.stats.view.filterKeys(keep.contains).toMap ++ w.stats, m.schemaJson,
      m.dvs, m.dirRows.view.filterKeys(keep.contains).toMap + (w.dir -> w.rows),
      m.dirNulls.view.filterKeys(keep.contains).toMap ++ w.nullsEntry,
      colMap = m.colMap))
  }

  /** Row-level UPDATE (UPDATE … SET … WHERE predicate): matched rows get
    * `assignments` applied, null-predicate rows keep their values (SQL
    * semantics — only TRUE matches). Each assignment casts to the
    * column's COMMITTED type, so an UPDATE can never drift the table
    * schema. Dir-grained copy-on-write like [[delete]]: one discovery job
    * finds the dirs containing matched rows, only those rewrite (matched
    * and unmatched rows together — the dir stays whole); untouched dirs
    * and their skipping stats carry into the new version as-is. CHECK
    * constraints validate the rewritten dirs' post-image before anything
    * is written.
    */
  def update(predicate: Column, assignments: Map[String, Column]): Long = {
    require(assignments.nonEmpty, "update requires at least one assignment")
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val v = cur + 1
    val m = manifest(cur)
    val snap = readVersion(cur)
    val missing = assignments.keySet.filterNot(snap.columns.contains)
    require(missing.isEmpty,
      s"update assigns unknown columns: ${missing.mkString(", ")}")
    // physical space for discovery and the rewrite: assignment keys map to
    // their physical slots, predicate/value expressions translate names
    val assignP = assignments.map { case (k, e) =>
      physName(m, k) -> toPhysicalCol(m, e)
    }
    val pred = coalesce(toPhysicalCol(m, predicate), lit(false))
    val hitDirs = readDirsWithPos(m, m.dataDirs).filter(pred)
      .select(regexp_extract(col(dvFileCol),
        s"(data/c[0-9]{10}-[0-9a-f]{8}(?:/$chunkCol=[0-9]+)?)", 1).as("d"))
      .distinct().collect().map(_.getString(0)).toSet // bounded: dir names
    if (hitDirs.isEmpty)
      return commit(m.copy(version = v, operation = "update",
        timestampMs = System.currentTimeMillis()))
    val keep = m.dataDirs.filterNot(d => matchesToken(d, hitDirs))
    val hit = m.dataDirs.filter(d => matchesToken(d, hitDirs))
    val src = readDirsOf(m, hit)
    val rewritten = src.select(src.schema.fields.map { f =>
      assignP.get(f.name) match {
        case Some(e) => when(pred, e.cast(f.dataType))
          .otherwise(col(f.name)).as(f.name)
        case None => col(f.name)
      }
    }.toSeq: _*)
    validateConstraints(rewritten, "update")
    val w = writeData(rewritten, v)
    commit(Manifest(v, "update", System.currentTimeMillis(), keep :+ w.dir,
      m.stats.view.filterKeys(keep.contains).toMap ++ w.stats, m.schemaJson,
      m.dvs, m.dirRows.view.filterKeys(keep.contains).toMap + (w.dir -> w.rows),
      m.dirNulls.view.filterKeys(keep.contains).toMap ++ w.nullsEntry,
      colMap = m.colMap))
  }

  /** Full SQL MERGE INTO (the three-arm statement: WHEN MATCHED [AND c]
    * THEN UPDATE/DELETE, WHEN NOT MATCHED [AND c] THEN INSERT, WHEN NOT
    * MATCHED BY SOURCE [AND c] THEN UPDATE/DELETE) against an ARBITRARY
    * ON condition — the clause-faithful generalization of [[merge]]'s
    * keyed-upsert shape, and the execution target of SQL-text
    * `MERGE INTO` over graft tables (see `GraftSqlDmlRule`).
    *
    * Semantics (SQL standard / Delta):
    *   - Clauses apply in DECLARED order: the first clause of the row's
    *     arm whose condition evaluates TRUE fires; no clause → row is
    *     kept (matched / not-matched-by-source) or dropped (insert arm).
    *   - A target row matched by MORE THAN ONE source row is a
    *     cardinality violation whenever matched clauses exist — the job
    *     fails (distributed check, no driver materialization).
    *   - NULL clause conditions are FALSE (SQL three-valued logic); the
    *     ON condition's null semantics come from the join itself.
    *
    * `source`'s column names must be DISJOINT from the target's logical
    * columns; condition/clause expressions reference target columns by
    * logical name and source columns by the source frame's names.
    *
    * Dir-grained copy-on-write, same discipline as [[update]]/[[delete]]:
    * one discovery join finds the data dirs holding matched rows; only
    * those rewrite (post-image of every row in the dir), not-matched
    * inserts land in the same new dir, untouched dirs carry their
    * skipping stats forward. With a `notMatchedBySource` arm every dir
    * is a rewrite candidate (any row might be unmatched) — the
    * stats-scoped narrowing [[merge]] applies to its sync arm is the
    * documented optimization lever. At 100 TB the discovery and rewrite
    * joins extract equi-keys from the ON condition (Catalyst plans a
    * broadcast or shuffled hash join); the source is never collected.
    */
  def mergeInto(source: DataFrame, condition: Column,
                matched: Seq[VersionedTable.MergeIntoAction] = Nil,
                notMatched: Seq[VersionedTable.MergeIntoAction] = Nil,
                notMatchedBySource: Seq[VersionedTable.MergeIntoAction] = Nil): Long =
    mergeIntoImpl(source, condition, matched, notMatched, notMatchedBySource,
      stableSource = false)

  /** [[mergeInto]] with the source-stabilizing checkpoint OPTIONALLY
    * skipped: the partitioned layer's member merges each receive a filter
    * over a frame the coordinator ALREADY materialized — deterministic
    * and replay-stable by construction — so re-storing every member's
    * slice would only add one store-job per member per commit.
    */
  private[sources] def mergeIntoImpl(source: DataFrame, condition: Column,
                matched: Seq[VersionedTable.MergeIntoAction],
                notMatched: Seq[VersionedTable.MergeIntoAction],
                notMatchedBySource: Seq[VersionedTable.MergeIntoAction],
                stableSource: Boolean): Long = {
    require(matched.nonEmpty || notMatched.nonEmpty || notMatchedBySource.nonEmpty,
      "MERGE INTO requires at least one WHEN clause")
    require(matched.forall(a => a.isInstanceOf[MergeIntoUpdate] ||
      a.isInstanceOf[MergeIntoDelete]),
      "WHEN MATCHED clauses must be UPDATE or DELETE")
    require(notMatchedBySource.forall(a => a.isInstanceOf[MergeIntoUpdate] ||
      a.isInstanceOf[MergeIntoDelete]),
      "WHEN NOT MATCHED BY SOURCE clauses must be UPDATE or DELETE")
    require(notMatched.forall(_.isInstanceOf[MergeIntoInsert]),
      "WHEN NOT MATCHED clauses must be INSERT")
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val v = cur + 1
    val m = manifest(cur)
    val logicalFields = readVersion(cur).schema.fields.toSeq
    val clash = source.columns.toSet
      .intersect(logicalFields.map(_.name).toSet)
    require(clash.isEmpty,
      s"source columns must not shadow target columns: ${clash.mkString(", ")}")

    def q(n: String) = col(s"`$n`")
    val srcFlag = "__vt_mi_src"
    // STABILIZE the source: discovery, rewrite, and insert anti-join are
    // three independent jobs — a non-deterministic or concurrently-read
    // source would otherwise apply clauses inconsistently across them
    // (Delta materializes its merge source for exactly this reason).
    // Lazy local checkpoint: first job computes, later jobs reuse. The
    // RELEASABLE form, unpersisted in the finally below — plain
    // localCheckpoint pins its blocks for the session, and
    // mergeIntoRetrying re-checkpoints per conflict attempt.
    val (srcMarked, releaseSrc) =
      if (stableSource) (source.withColumn(srcFlag, lit(true)), () => ())
      else org.apache.spark.sql.GraftColumnBridge
        .localCheckpointReleasable(source.withColumn(srcFlag, lit(true)))
    try {
    // logical-name view of `dirs` keeping the row-position columns
    // (discovery extracts the owning dir; the cardinality check needs a
    // per-physical-row identity)
    def logicalWithPos(dirs: Seq[String]): DataFrame = {
      val raw = readDirsWithPos(m, dirs)
      if (m.colMap.isEmpty) raw
      else raw.select(m.colMap.map { case (p, l) => col(p).as(l) } ++
        Seq(col(dvFileCol), col(dvRowCol)): _*)
    }
    val dirRe = s"(data/c[0-9]{10}-[0-9a-f]{8}(?:/$chunkCol=[0-9]+)?)"

    val hit: Seq[String] =
      if (notMatchedBySource.nonEmpty) m.dataDirs
      else if (matched.nonEmpty) {
        // one collect_set aggregate instead of distinct + collect (same
        // bounded dir-name result, one less exchange round-trip)
        val tokens = logicalWithPos(m.dataDirs)
          .join(srcMarked, condition, "inner")
          .agg(collect_set(
            regexp_extract(col(dvFileCol), dirRe, 1)).as("d"))
          .head().getSeq[String](0).toSet // bounded: dir names
        m.dataDirs.filter(d => matchesToken(d, tokens))
      } else Nil
    val keep = m.dataDirs.filterNot(hit.contains)

    // first applicable clause of an arm as an index column (-1 = none)
    def firstIdx(actions: Seq[VersionedTable.MergeIntoAction], base: Column): Column =
      actions.zipWithIndex.foldRight(lit(-1): Column) { case ((a, i), els) =>
        when(base && a.cond.map(c => coalesce(c, lit(false)))
          .getOrElse(lit(true)), lit(i)).otherwise(els)
      }

    val rewritten: DataFrame =
      if (hit.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(logicalFields))
      else {
        val joined0 = logicalWithPos(hit).join(srcMarked, condition, "left_outer")
        val matchedFlag = col(srcFlag).isNotNull
        val joined =
          if (matched.isEmpty) {
            // no matched clause reads source columns, but the left join
            // still FANS OUT a target row matched by several source rows
            // — keep exactly one copy per physical row (any copy: the
            // clauses below use only target columns + the match flag)
            val w = Window.partitionBy(col(dvFileCol), col(dvRowCol))
              .orderBy(lit(1))
            joined0.withColumn("__vt_mi_rn", row_number().over(w))
              .filter(col("__vt_mi_rn") === 1).drop("__vt_mi_rn")
          } else {
            val w = Window.partitionBy(col(dvFileCol), col(dvRowCol))
            joined0
              .withColumn("__vt_mi_cnt",
                count(when(matchedFlag, lit(1))).over(w))
              .filter(assert_true(col("__vt_mi_cnt") <= 1, lit(
                "MERGE INTO: a target row matched multiple source rows " +
                  "(cardinality violation)")).isNull)
          }
        val mIdx = firstIdx(matched, matchedFlag)
        val nIdx = firstIdx(notMatchedBySource, !matchedFlag)
        val deleteFired = (matched.zipWithIndex.collect {
          case (_: MergeIntoDelete, i) => mIdx === i
        } ++ notMatchedBySource.zipWithIndex.collect {
          case (_: MergeIntoDelete, i) => nIdx === i
        }).reduceOption(_ || _).getOrElse(lit(false))
        def newVal(f: org.apache.spark.sql.types.StructField): Column = {
          val arms: Seq[(Column, Column)] =
            matched.zipWithIndex.collect {
              case (u: MergeIntoUpdate, i) if u.set.contains(f.name) =>
                (mIdx === i, u.set(f.name).cast(f.dataType))
            } ++ notMatchedBySource.zipWithIndex.collect {
              case (u: MergeIntoUpdate, i) if u.set.contains(f.name) =>
                (nIdx === i, u.set(f.name).cast(f.dataType))
            }
          arms.foldRight(q(f.name)) { case ((p, nv), els) =>
            when(p, nv).otherwise(els)
          }
        }
        joined.filter(!deleteFired)
          .select(logicalFields.map(f => newVal(f).as(f.name)): _*)
      }

    val inserts: DataFrame =
      if (notMatched.isEmpty)
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          StructType(logicalFields))
      else {
        val unmatchedSrc = srcMarked.drop(srcFlag)
          .join(readVersion(cur), condition, "left_anti")
        val iIdx = firstIdx(notMatched, lit(true))
        unmatchedSrc.withColumn("__vt_mi_idx", iIdx)
          .filter(col("__vt_mi_idx") >= 0)
          .select(logicalFields.map { f =>
            notMatched.zipWithIndex.collect {
              case (ins: MergeIntoInsert, i) =>
                (col("__vt_mi_idx") === i,
                  ins.values.get(f.name).map(_.cast(f.dataType))
                    .getOrElse(lit(null).cast(f.dataType)))
            }.foldRight(lit(null).cast(f.dataType): Column) {
              case ((p, nv), els) => when(p, nv).otherwise(els)
            }.as(f.name)
          }: _*)
      }

    if (hit.isEmpty && notMatched.isEmpty)
      return commit(m.copy(version = v, operation = "merge_into",
        timestampMs = System.currentTimeMillis()))

    val postLogical = rewritten.unionByName(inserts)
    validateConstraints(postLogical, "merge_into")
    val postPhys =
      if (m.colMap.isEmpty) postLogical
      else withDroppedNulls(m,
        postLogical.select(m.colMap.map { case (p, l) => q(l).as(p) }: _*))
    val aligned = m.schemaJson.map(parseSchema) match {
      case Some(ps) => postPhys.select(ps.fieldNames.map(q).toSeq: _*)
      case None => postPhys
    }
    val w = writeData(aligned, v)
    commit(Manifest(v, "merge_into", System.currentTimeMillis(),
      keep :+ w.dir,
      m.stats.view.filterKeys(keep.contains).toMap ++ w.stats, m.schemaJson,
      m.dvs, m.dirRows.view.filterKeys(keep.contains).toMap + (w.dir -> w.rows),
      m.dirNulls.view.filterKeys(keep.contains).toMap ++ w.nullsEntry,
      colMap = m.colMap))
    } finally releaseSrc()
  }

  /** [[mergeInto]] under [[withConflictRetry]] — recompute semantics as in
    * [[mergeRetrying]].
    */
  def mergeIntoRetrying(source: DataFrame, condition: Column,
                        matched: Seq[VersionedTable.MergeIntoAction] = Nil,
                        notMatched: Seq[VersionedTable.MergeIntoAction] = Nil,
                        notMatchedBySource: Seq[VersionedTable.MergeIntoAction] = Nil,
                        maxAttempts: Int = 5): Long =
    withConflictRetry(maxAttempts)(
      mergeInto(source, condition, matched, notMatched, notMatchedBySource))

  /** [[mergeIntoRetrying]] over an already-materialized source
    * ([[mergeIntoImpl]]'s `stableSource` contract).
    */
  private[sources] def mergeIntoStableRetrying(source: DataFrame, condition: Column,
                        matched: Seq[VersionedTable.MergeIntoAction] = Nil,
                        notMatched: Seq[VersionedTable.MergeIntoAction] = Nil,
                        notMatchedBySource: Seq[VersionedTable.MergeIntoAction] = Nil,
                        maxAttempts: Int = 5): Long =
    withConflictRetry(maxAttempts)(
      mergeIntoImpl(source, condition, matched, notMatched, notMatchedBySource,
        stableSource = true))

  // ---------------------------------------------------------------- read

  /** Latest snapshot. */
  def read(): DataFrame = readVersion(latestVersion.getOrElse(
    throw new IllegalStateException(s"no committed version at $root")))

  /** `SELECT count(*)` answered from the manifest's per-dir row ledger —
    * zero data files opened (Delta answers metadata-only counts the same
    * way). Returns None when the count cannot be metadata-exact: live
    * deletion vectors (physical rows ≠ logical rows until a rewrite
    * materializes them) or a dir written before row tracking. At 100 TB
    * this is the difference between a catalog lookup and a full scan.
    */
  def metadataCount(): Option[Long] = latestVersion.flatMap { v =>
    val m = manifest(v)
    if (m.dvs.nonEmpty) None
    else {
      val known = m.dataDirs.flatMap(m.dirRows.get)
      if (known.size == m.dataDirs.size) Some(known.sum) else None
    }
  }

  /** `SELECT count(col)` / null-count answered from the manifest's per-dir
    * null ledger — zero data files opened. Returns the NULL row count of
    * `colName` in the live snapshot; None when any non-empty dir predates
    * the ledger or live deletion vectors make physical ≠ logical rows.
    * (`count(col)` is then [[metadataCount]] minus this.)
    */
  def metadataNullCount(colName: String): Option[Long] =
    latestVersion.flatMap { v =>
      val m = manifest(v)
      if (m.dvs.nonEmpty || !statsCols.contains(colName)) None
      else {
        val counts = m.dataDirs.map { d =>
          if (m.dirRows.get(d).contains(0L)) Some(0L)
          else m.dirNulls.get(d).flatMap(_.get(colName))
        }
        if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
      }
    }

  /** `SELECT min(col), max(col)` answered from the manifest's per-dir
    * stats — zero data files opened. Values are stat-domain strings
    * (timestamps = epoch micros, see [[candidateDirs]]). Declines to None
    * when exactness can't be guaranteed: live DVs (a deleted row may have
    * BEEN the min), or any non-empty dir without a stats entry for the
    * column (pre-tracking dir, or an all-null dir — indistinguishable
    * from the manifest alone, so both decline; SQL min/max ignores nulls
    * and a false "exact" answer is worse than a scan).
    */
  def metadataMinMax(colName: String): Option[(String, String)] =
    latestVersion.flatMap { v =>
      val m = manifest(v)
      if (m.dvs.nonEmpty || !statsCols.contains(colName)) None
      else {
        val entries = m.dataDirs.map { d =>
          // skippable without stats: zero rows, or (per the null ledger)
          // every row null in this column — min/max ignores nulls anyway
          val empty = m.stats.get(d).exists(_.contains(rowsMarker)) ||
            m.dirRows.get(d).contains(0L) ||
            (for {
              n <- m.dirNulls.get(d).flatMap(_.get(colName))
              r <- m.dirRows.get(d)
            } yield n == r).getOrElse(false)
          (m.stats.get(d).flatMap(_.get(colName)), empty)
        }
        if (entries.exists { case (st, empty) => st.isEmpty && !empty }) None
        else {
          val known = entries.flatMap(_._1)
          known.reduceOption { (a, b) =>
            ColStats(
              if (statCompare(a.kind, a.min, b.min) <= 0) a.min else b.min,
              if (statCompare(a.kind, a.max, b.max) >= 0) a.max else b.max,
              a.kind)
          }.map(st => (st.min, st.max))
        }
      }
    }

  /** [[metadataCount]] pinned to snapshot `v` — the DSv2 aggregate-
    * pushdown path answers `SELECT count(*)` from here without opening a
    * file.
    */
  private[sources] def metadataCountAt(v: Long): Option[Long] = {
    val m = manifest(v)
    if (m.dvs.nonEmpty) None
    else {
      val known = m.dataDirs.flatMap(m.dirRows.get)
      if (known.size == m.dataDirs.size) Some(known.sum) else None
    }
  }

  /** [[metadataNullCount]] pinned to snapshot `v`, judged from the
    * manifest ledgers alone (no handle-side statsCols needed — a read
    * handle knows nothing about the writer's config). Logical name in,
    * mapping applied.
    */
  private[sources] def metadataNullCountAt(v: Long, colName: String): Option[Long] = {
    val m = manifest(v)
    if (m.dvs.nonEmpty) None
    else {
      val phys = physName(m, colName)
      val counts = m.dataDirs.map { d =>
        if (m.dirRows.get(d).contains(0L)) Some(0L)
        else m.dirNulls.get(d).flatMap(_.get(phys))
      }
      if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
    }
  }

  /** [[metadataMinMax]] pinned to snapshot `v`, manifest-judged like
    * [[metadataNullCountAt]], and returning the full [[ColStats]] (the
    * caller needs `kind` to decode the stat-domain string back to a
    * typed value).
    */
  private[sources] def metadataMinMaxAt(v: Long, colName: String): Option[ColStats] = {
    val m = manifest(v)
    if (m.dvs.nonEmpty) None
    else {
      val phys = physName(m, colName)
      val entries = m.dataDirs.map { d =>
        val empty = m.stats.get(d).exists(_.contains(rowsMarker)) ||
          m.dirRows.get(d).contains(0L) ||
          (for {
            n <- m.dirNulls.get(d).flatMap(_.get(phys))
            r <- m.dirRows.get(d)
          } yield n == r).getOrElse(false)
        (m.stats.get(d).flatMap(_.get(phys)), empty)
      }
      if (entries.exists { case (st, empty) => st.isEmpty && !empty }) None
      else entries.flatMap(_._1).reduceOption { (a, b) =>
        ColStats(
          if (statCompare(a.kind, a.min, b.min) <= 0) a.min else b.min,
          if (statCompare(a.kind, a.max, b.max) >= 0) a.max else b.max,
          a.kind)
      }
    }
  }

  /** Snapshot isolation: the exact file set committed as version `v`,
    * regardless of later commits (time travel by version). Reads under the
    * MANIFEST schema when recorded, so dirs written before an additive
    * evolution surface the added columns as null. Deletion vectors of the
    * version (merge-on-read deletes) are applied.
    */
  def readVersion(v: Long): DataFrame = {
    val m = manifest(v)
    applyMapping(m, readDirsOf(m, m.dataDirs))
  }

  /** Raw parquet of `dirs` under the manifest schema — no DV filtering. */
  private def rawDirs(m: Manifest, dirs: Seq[String]): DataFrame =
    rawPaths(m, dirs.map(d => new Path(rootPath, d).toString))

  /** Like [[rawDirs]] but over already-RESOLVED paths — whole data dirs
    * or individual part files (the file-grain pruning read).
    */
  private def rawPaths(m: Manifest, paths: Seq[String]): DataFrame = {
    val reader = m.schemaJson.map(j => spark.read.schema(parseSchema(j)))
      .getOrElse(spark.read)
    reader.parquet(paths: _*)
  }

  /** DV-aware read over resolved paths (see [[readDirsWithPos]]). */
  private def readPathsOf(m: Manifest, paths: Seq[String]): DataFrame =
    if (m.dvs.isEmpty) rawPaths(m, paths)
    else {
      val base = rawPaths(m, paths).select(col("*"),
        col("_metadata.file_path").as(dvFileCol),
        col("_metadata.row_index").as(dvRowCol))
      base.join(dvFrame(m).get, Seq(dvFileCol, dvRowCol), "left_anti")
        .drop(dvFileCol, dvRowCol)
    }

  private def dvFrame(m: Manifest): Option[DataFrame] =
    if (m.dvs.isEmpty) None
    else Some(spark.read.parquet(
      m.dvs.map(d => new Path(rootPath, d).toString): _*))

  /** DV-aware read of a dir subset, keeping the row-position columns
    * ([[dvFileCol]], [[dvRowCol]]) — discovery jobs extract the owning dir
    * from [[dvFileCol]], which is why this projects `_metadata` BEFORE any
    * join (it binds per-relation where `input_file_name` refuses a
    * two-source plan). The anti-join is on (file, row_index): a DV lists
    * logically-deleted row positions; entries for files a later rewrite
    * dropped simply match nothing. DVs are tiny relative to the table
    * (they hold only deleted positions), so AQE broadcasts the anti-join.
    */
  private def readDirsWithPos(m: Manifest, dirs: Seq[String]): DataFrame = {
    val base = rawDirs(m, dirs).select(col("*"),
      col("_metadata.file_path").as(dvFileCol),
      col("_metadata.row_index").as(dvRowCol))
    dvFrame(m) match {
      case None     => base
      case Some(dv) => base.join(dv, Seq(dvFileCol, dvRowCol), "left_anti")
    }
  }

  /** DV-aware read of a dir subset (the user-facing column set). */
  private def readDirsOf(m: Manifest, dirs: Seq[String]): DataFrame =
    if (m.dvs.isEmpty) rawDirs(m, dirs)
    else readDirsWithPos(m, dirs).drop(dvFileCol, dvRowCol)

  /** Time travel by wall-clock: newest version committed at or before
    * `timestampMs` (TIMESTAMP AS OF semantics). O(1) manifest-file reads
    * once a checkpoint covers the log.
    */
  def readAsOf(timestampMs: Long): DataFrame = {
    val vs = versions.filter(v => manifest(v).timestampMs <= timestampMs)
    require(vs.nonEmpty, s"no version at or before $timestampMs in $root")
    readVersion(vs.max)
  }

  /** Compaction: rewrite the current snapshot (typically many small
    * append deltas) into ONE data directory and commit it as a new
    * version. Contents are unchanged — history stays readable until
    * [[vacuum]]. Run when the file count of the live snapshot starts to
    * dominate scan planning (the small-files problem).
    */
  def compact(): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"nothing to compact at $root"))
    val v = cur + 1
    val m = manifest(cur)
    // physical-space rewrite (DV-aware): stats stay keyed to the file
    // columns and any column-mapping overlay carries unchanged
    val w = writeData(readDirsOf(m, m.dataDirs), v)
    commit(Manifest(v, "compact", System.currentTimeMillis(), Seq(w.dir),
      w.stats, m.schemaJson, dirRows = w.rowsEntry,
      dirNulls = w.nullsEntry, colMap = m.colMap))
  }

  /** Bin-packing OPTIMIZE: rewrite ONLY the data dirs smaller than
    * `minRows` into one consolidated dir; everything else carries into the
    * new version untouched, with its skipping stats, row/null ledgers, and
    * bloom sidecars intact. This is Delta's OPTIMIZE discipline — the
    * small-files problem is the SMALL files, and a full-snapshot rewrite
    * ([[compact]]) of a 100 TB table to fix a few thousand streaming
    * micro-batch dirs is the wrong tool by five orders of magnitude.
    *
    * Dir selection is METADATA-ONLY (the per-dir row ledger; a dir without
    * a ledger entry counts as small — conservative, it gets consolidated
    * and gains a ledger). Deletion vectors carry: the rewrite reads its
    * dirs DV-aware (so their deleted rows materialize away), and carried
    * dirs keep filtering through the manifest's DV list — DV entries for
    * rewritten files simply match nothing. Returns the new version, or
    * None when fewer than two dirs qualify (nothing to pack).
    */
  def compactSmall(minRows: Long): Option[Long] = {
    require(minRows >= 1, "minRows must be >= 1")
    latestVersion.flatMap { cur =>
      val m = manifest(cur)
      val (small, big) = m.dataDirs.partition(d =>
        m.dirRows.get(d).forall(_ < minRows))
      if (small.size <= 1) None
      else {
        val v = cur + 1
        val w = writeData(readDirsOf(m, small), v)
        Some(commit(Manifest(v, "compact_small", System.currentTimeMillis(),
          big :+ w.dir,
          m.stats.view.filterKeys(big.contains).toMap ++ w.stats,
          m.schemaJson, m.dvs,
          m.dirRows.view.filterKeys(big.contains).toMap + (w.dir -> w.rows),
          m.dirNulls.view.filterKeys(big.contains).toMap ++ w.nullsEntry,
          colMap = m.colMap)))
      }
    }
  }

  /** [[compactSmall]] under conflict handling with the DISJOINT-FILE
    * commutativity rule — the optimization [[withConflictRetry]]'s
    * conservative recompute leaves on the table: when the computed
    * consolidation loses the commit race but the winner did not touch
    * its inputs (a pure append, the common streaming case — every small
    * dir still live, schema/column-mapping/DV set unchanged), the
    * already-written consolidated dir is REBASED onto the new head and
    * re-committed, paying one manifest write instead of re-reading and
    * re-writing the data. Any other winner (a merge/delete that rewrote
    * or DV'd an input dir, a schema change) fails the guard and the
    * attempt recomputes from the fresh snapshot. Attempts are shared
    * across rebases and recomputes; abandoned consolidation dirs are
    * vacuum-swept orphans, as everywhere else.
    */
  def compactSmallRetrying(minRows: Long,
                           maxAttempts: Int = 5): Option[Long] = {
    require(minRows >= 1, "minRows must be >= 1")
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
    var attempt = 1
    while (true) {
      val curOpt = latestVersion
      if (curOpt.isEmpty) return None
      val m = manifest(curOpt.get)
      val (small, _) = m.dataDirs.partition(d =>
        m.dirRows.get(d).forall(_ < minRows))
      if (small.size <= 1) return None // became moot under the winner
      val w = writeData(readDirsOf(m, small), m.version + 1)
      var base = m
      var rebasing = true
      while (rebasing) {
        try return Some(commit(rebasedCompaction(small, w, base)))
        catch {
          case e: ConcurrentWriteException =>
            if (attempt >= maxAttempts) throw e
            attempt += 1
            val h = manifest(latestVersion.get)
            if (compactionRebaseSafe(small, m, h)) base = h
            else rebasing = false // full recompute from the new head
        }
      }
    }
    None // unreachable
  }

  /** A lost compaction commutes with the winner iff the winner left the
    * compaction's inputs untouched: every consolidated dir still live,
    * and the schema / column mapping / deletion-vector set it was read
    * under unchanged (a new DV on an input dir would resurrect its
    * deleted rows through the consolidated copy).
    */
  private[graft] def compactionRebaseSafe(small: Seq[String], read: Manifest,
                                          head: Manifest): Boolean =
    small.forall(head.dataDirs.contains) &&
      head.schemaJson == read.schemaJson &&
      head.colMap == read.colMap &&
      head.dvs == read.dvs

  /** The compaction manifest re-expressed against `base`: base's dirs
    * minus the consolidated inputs plus the already-written output —
    * dirs the winner added carry through with their stats/ledgers.
    */
  private[graft] def rebasedCompaction(small: Seq[String], w: DirWrite,
                                       base: Manifest): Manifest = {
    val keep = base.dataDirs.filterNot(small.contains)
    Manifest(base.version + 1, "compact_small", System.currentTimeMillis(),
      keep :+ w.dir,
      base.stats.view.filterKeys(keep.contains).toMap ++ w.stats,
      base.schemaJson, base.dvs,
      base.dirRows.view.filterKeys(keep.contains).toMap + (w.dir -> w.rows),
      base.dirNulls.view.filterKeys(keep.contains).toMap ++ w.nullsEntry,
      colMap = base.colMap)
  }

  /** [[compactSmall]]-when-needed: pack iff the live snapshot references
    * more than `maxDirs` data directories (manifest-only check, cheap
    * after every commit). The streaming auto-OPTIMIZE policy: micro-batch
    * dirs consolidate until the consolidated dir crosses `minRows` and
    * graduates to "big", after which it is never rewritten again —
    * bounded write amplification, where a full [[compact]] re-pays the
    * whole table every trigger.
    */
  def packIfFragmented(maxDirs: Int, minRows: Long,
                       maxAttempts: Int = 1): Option[Long] = {
    require(maxDirs >= 1, "maxDirs must be >= 1")
    latestVersion.filter(v => manifest(v).dataDirs.size > maxDirs)
      .flatMap(_ =>
        if (maxAttempts <= 1) compactSmall(minRows)
        else compactSmallRetrying(minRows, maxAttempts))
  }

  /** OPTIMIZE-when-needed: [[compact]] iff the live snapshot references
    * more than `maxDirs` data directories, else nothing. A manifest-only
    * check (no data read), so it is cheap to call after every commit —
    * the auto-compaction hook for long-running writers (each MERGE with
    * inserts adds a dir; a streaming upsert would otherwise fragment the
    * table without bound). Returns the compaction version when it ran.
    * NB: plain compact folds everything into ONE dir — on a Z-order
    * clustered table run [[compactClustered]] on your own cadence instead.
    */
  def compactIfFragmented(maxDirs: Int): Option[Long] = {
    require(maxDirs >= 1, "maxDirs must be >= 1")
    latestVersion.filter(v => manifest(v).dataDirs.size > maxDirs)
      .map(_ => compact())
  }

  /** RESTORE TABLE … TO VERSION: commit a new version whose file set IS
    * version `v`'s — a metadata-only rollback (no data moves), and history
    * is preserved: the rolled-back-over versions stay readable until
    * [[vacuum]], exactly Delta's RESTORE semantics.
    */
  def restore(v: Long): Long = {
    val m = manifest(v) // throws for unknown versions
    val next = latestVersion.get + 1
    commit(Manifest(next, "restore", System.currentTimeMillis(),
      m.dataDirs, m.stats, m.schemaJson, m.dvs, m.dirRows, m.dirNulls,
      colMap = m.colMap))
  }

  /** SHALLOW CLONE: a new table at `destRoot` whose version 0 references
    * this table's current data files IN PLACE — metadata only, zero bytes
    * copied, stats carried (so data skipping keeps pruning on the clone).
    * Writes on the clone are copy-on-write under the clone's own root; the
    * clone's vacuum skips foreign refs, and [[compact]] materializes the
    * clone into a fully independent table. The Delta-shared caveat:
    * vacuuming the SOURCE can drop files a live clone still references —
    * vacuum sources only once their clones are materialized or dropped.
    *
    * `asOf` clones a PINNED (possibly non-latest) version — the
    * fork-at-a-point verb [[MultiTableTxn.cloneAt]] composes per member.
    * The caveat sharpens accordingly: a non-latest pin is exactly what a
    * plain source vacuum reclaims first, so fork only versions something
    * still retains (a live transaction's pin, [[vacuumKeeping]]'s keep
    * set) — or materialize the clone before the source vacuums.
    */
  def shallowCloneTo(destRoot: String,
                     asOf: Option[Long] = None): VersionedTable = {
    asOf.foreach(v => require(versions.contains(v),
      s"version $v not in the log at $root (live: " +
        s"${versions.mkString(",")}) — vacuumed or never committed"))
    val cur = asOf.orElse(latestVersion).getOrElse(
      throw new IllegalStateException(s"nothing to clone at $root"))
    val m = manifest(cur)
    val dest = new VersionedTable(spark, destRoot, statsCols,
      checkpointInterval, constraints, bloomCols, fileStats)
    require(dest.latestVersion.isEmpty, s"$destRoot is already a table")
    // fully-qualified (scheme + absolute): a relative table root would
    // otherwise produce entries that resolve against the CLONE's root, and
    // an unqualified path could slip past the clone-vacuum foreign guard
    def abs(d: String) = fs.makeQualified(new Path(rootPath, d)).toString
    dest.commit(Manifest(0L, "clone", System.currentTimeMillis(),
      m.dataDirs.map(abs),
      m.stats.map { case (d, st) => abs(d) -> st },
      m.schemaJson, m.dvs.map(abs),
      m.dirRows.map { case (d, n) => abs(d) -> n },
      m.dirNulls.map { case (d, n) => abs(d) -> n },
      colMap = m.colMap))
    dest
  }

  /** CONVERT-style metadata-only adoption of an externally-produced file
    * snapshot (the import half of [[DeltaLogExport]]): commit version 0
    * referencing `files` — which MUST be fully-qualified absolute paths,
    * so the foreign guard keeps vacuum away from data this table does not
    * own — under `schemaJson`. No data is read or copied; no stats/ledger
    * entries exist, so skipping-dependent reads degrade gracefully to
    * full scans (exactly a freshly-CONVERTed table's position).
    */
  private[sources] def adoptForeignSnapshot(files: Seq[String],
      schemaJson: Option[String], operation: String): Long = {
    require(latestVersion.isEmpty, s"$root is already a table")
    require(files.forall(isForeign),
      "adopted snapshot paths must be fully-qualified (foreign)")
    commit(Manifest(0L, operation, System.currentTimeMillis(), files,
      Map.empty, schemaJson, Nil, Map.empty, Map.empty, Nil))
  }

  /** Z-order clustered compaction (OPTIMIZE … ZORDER BY): rewrite the
    * snapshot into `nChunks` data dirs ordered along a Morton curve over
    * `clusterCols`, so the per-dir min/max stats become selective on EVERY
    * cluster column at once — a narrow range on any of them prunes most
    * dirs via [[candidateDirs]]/[[readRange]] (linear sort clusters only
    * its leading column; bit interleaving is what makes the 2nd..kth
    * column prunable too).
    *
    * Mechanics, all distributed except O(bins) driver literals:
    * per-column bin boundaries from one multi-column `approxQuantile`
    * pass (quantile bins, so skew cannot starve the curve of
    * resolution); the 4-bit bins interleave into a z-value (pure integer
    * expressions, codegen'd); chunk = z-value quantile bucket, written
    * with `partitionBy` so each chunk is its own data dir; per-chunk
    * stats from one grouped aggregate. Four scans of the snapshot total
    * — the price of an OPTIMIZE job, run it at the cadence you'd run
    * Delta's.
    *
    * `clusterCols` may be numeric, timestamp, or string (strings bin by
    * their first-6-byte UTF8 prefix, [[clusterValExpr]]; nulls sort to the
    * first bin). Chunks are quantile-balanced, so each rewrites
    * ~|table|/nChunks rows; size nChunks to the target file size at your
    * scale.
    */
  def compactClustered(clusterCols: Seq[String], nChunks: Int = 16,
                       curve: String = "z"): Long = {
    val cur = latestVersion.getOrElse(
      throw new IllegalStateException(s"nothing to compact at $root"))
    val v = cur + 1
    val m = manifest(cur)
    // physical-space rewrite, like [[compact]] — cluster columns arrive
    // as user-facing names and translate through the mapping
    val df = readDirsOf(m, m.dataDirs)
    clusterWrite(df, clusterCols.map(physName(m, _)), nChunks, v,
      curve) match {
      case None => // empty snapshot: no chunk subdirs were written
        val w = writeData(df, v)
        commit(Manifest(v, "compact_clustered",
          System.currentTimeMillis(), Seq(w.dir), w.stats,
          m.schemaJson, dirRows = w.rowsEntry,
          dirNulls = w.nullsEntry, colMap = m.colMap))
      case Some(cr) =>
        commit(Manifest(v, "compact_clustered", System.currentTimeMillis(),
          cr.dirs, cr.stats, m.schemaJson,
          dirRows = cr.rows, dirNulls = cr.nulls, colMap = m.colMap))
    }
  }

  /** Incremental OPTIMIZE (liquid-clustering-flavored): cluster ONLY the
    * data dirs a previous clustering commit did NOT already chunk —
    * the plain append/merge tail — into a fresh set of `nChunks` chunk
    * subdirs; existing chunk dirs carry into the new version untouched,
    * with their stats/ledgers/bloom sidecars intact, and live deletion
    * vectors keep applying to them (the rewritten tail materializes its
    * own DV'd rows away). Each clustering batch gets its OWN quantile
    * boundaries — per-dir min/max pruning composes across batches, so a
    * range probe still opens only the overlapping chunks of every batch.
    * Rewrite cost is O(new data since the last OPTIMIZE), not O(table) —
    * at 100 TB the full [[compactClustered]] re-pays the entire table
    * every cadence, which is exactly what makes it unrunnable there.
    * Returns None when no unclustered dir exists (nothing to do).
    */
  def compactClusteredIncremental(clusterCols: Seq[String],
                                  nChunks: Int = 4,
                                  curve: String = "z"): Option[Long] =
    latestVersion.flatMap { cur =>
      val m = manifest(cur)
      val (chunked, plain) = m.dataDirs.partition(_.contains(s"/$chunkCol="))
      if (plain.isEmpty) None
      else {
        val v = cur + 1
        clusterWrite(readDirsOf(m, plain), clusterCols.map(physName(m, _)),
          nChunks, v, curve).map { cr =>
          commit(Manifest(v, "compact_clustered_incr",
            System.currentTimeMillis(), chunked ++ cr.dirs,
            m.stats.view.filterKeys(chunked.contains).toMap ++ cr.stats,
            m.schemaJson, m.dvs,
            m.dirRows.view.filterKeys(chunked.contains).toMap ++ cr.rows,
            m.dirNulls.view.filterKeys(chunked.contains).toMap ++ cr.nulls,
            colMap = m.colMap))
        }
      }
    }

  /** One clustering batch's manifest entries (chunk subdirs + their
    * skipping index).
    */
  private final case class ClusterResult(
      dirs: Seq[String], stats: Map[String, Map[String, ColStats]],
      rows: Map[String, Long], nulls: Map[String, Map[String, Long]])

  /** The clustering engine shared by [[compactClustered]] (whole
    * snapshot) and [[compactClusteredIncremental]] (unclustered tail):
    * bin → interleave → chunk → partitioned write → per-chunk stats.
    * None when `df` is empty (no chunk subdirs written).
    */
  private def clusterWrite(df: DataFrame, clusterCols: Seq[String],
                           nChunks: Int, v: Long,
                           curve: String = "z"): Option[ClusterResult] = {
    require(clusterCols.nonEmpty, "clusterCols must be non-empty")
    require(nChunks >= 2, "nChunks must be >= 2")
    require(curve == "z" || curve == "hilbert", s"unknown curve $curve")
    require(curve == "z" || clusterCols.length == 2,
      "the hilbert curve is 2-D: pass exactly 2 cluster columns")
    require(!df.columns.contains(chunkCol), s"$chunkCol is reserved")
    val bits = 4 // 16 bins per column; 2 cols → 256 curve cells
    val nBins = 1 << bits
    // one pass: quantile boundaries for every cluster column
    val qNames = clusterCols.indices.map(i => s"__q$i")
    val qdf = df.select(clusterCols.zip(qNames).map { case (c, q) =>
      clusterValExpr(df, c).as(q)
    }: _*)
    val probs = (1 until nBins).map(_.toDouble / nBins).toArray
    val cuts = qdf.stat.approxQuantile(qNames.toArray, probs, 0.001)
    def binExpr(c: String, cut: Array[Double]): Column = {
      val value = clusterValExpr(df, c)
      val n = cut.toSeq.distinct.sorted // degenerate distributions collapse cuts
        .map(b => when(value > lit(b), 1).otherwise(0))
        .foldLeft(lit(0))(_ + _)
      when(value.isNull, 0).otherwise(n)
    }
    val zv =
      if (curve == "hilbert")
        // same quantile bins, Hilbert walk instead of bit interleave —
        // consecutive curve positions are grid NEIGHBORS, so chunk spans
        // of a 2-D box probe tighten vs the z-curve's quadrant jumps
        graft.functions.HilbertCurve.hilbertIndex2(
          binExpr(clusterCols(0), cuts(0)),
          binExpr(clusterCols(1), cuts(1)), bits)
      else (0 until bits).flatMap { b =>
        clusterCols.zipWithIndex.map { case (c, i) =>
          shiftleft(shiftright(binExpr(c, cuts(i)), b).bitwiseAND(lit(1)),
            b * clusterCols.length + i)
        }
      }.reduce(_ + _)
    // chunk = quantile bucket of the z-value (second light pass)
    val zCuts = df.select(zv.cast("double").as("__z"))
      .stat.approxQuantile("__z", (1 until nChunks).map(_.toDouble / nChunks).toArray, 0.001)
      .toSeq.distinct.sorted
    val chunk = zCuts.map(b => when(zv.cast("double") > lit(b), 1).otherwise(0))
      .foldLeft(lit(0))(_ + _)
    val dir = f"data/c$v%010d-${java.util.UUID.randomUUID().toString.take(8)}"
    val clustered = df
      .withColumn(chunkCol, chunk)
      .repartition(nChunks, col(chunkCol))
      .sortWithinPartitions(col(chunkCol), zv)
    clustered.write.mode("overwrite").option("compression", "zstd")
      .partitionBy(chunkCol)
      .parquet(new Path(rootPath, dir).toString)
    // per-chunk stats in one grouped aggregate (clustering is pointless
    // without them — they ARE the skipping index the curve tightens).
    // Computed from the files JUST WRITTEN, not a fourth source scan:
    // the readback prunes to statsCols + the chunk partition column
    // (columnar, freshly compacted), where re-scanning the source would
    // re-evaluate every bin/z expression per row
    val written = spark.read
      .schema(StructType(df.schema.fields :+
        org.apache.spark.sql.types.StructField(chunkCol,
          org.apache.spark.sql.types.IntegerType)))
      .parquet(new Path(rootPath, dir).toString)
    val present = physTracked(statsCols).filter(df.columns.contains)
    val aggs = count(lit(1)).as("__rows") +: present.flatMap { c =>
      val e = statValExpr(df, c)
      Seq(min(e).as(s"__mn_$c"), max(e).as(s"__mx_$c"),
        count(e).as(s"__nn_$c"))
    }
    val perChunk = written
      .groupBy(chunkCol).agg(aggs.head, aggs.tail: _*).collect() // ≤ nChunks rows
    if (perChunk.isEmpty) return None // empty frame: nothing was written
    // per-chunk bloom sidecars: the chunk filter is a partition-column
    // predicate, so each bloom build reads only its own subdir's columns
    val bloomPresent = physTracked(bloomCols).filter(df.columns.contains)
    if (bloomPresent.nonEmpty) perChunk.foreach { row =>
      val n = row.getAs[Int](chunkCol)
      val rows = row.getAs[Long]("__rows")
      if (rows > 0)
        writeBlooms(written.filter(col(chunkCol) === n),
          s"$dir/$chunkCol=$n", bloomPresent, rows)
    }
    val entries = perChunk.sortBy(_.getAs[Int](chunkCol)).map { row =>
      val d = s"$dir/$chunkCol=${row.getAs[Int](chunkCol)}"
      val cols = present.flatMap { c =>
        (Option(row.getAs[Any](s"__mn_$c")), Option(row.getAs[Any](s"__mx_$c"))) match {
          case (Some(mn), Some(mx)) =>
            Some(c -> ColStats(mn.toString, mx.toString,
              statKind(df.schema(c).dataType)))
          case _ => None
        }
      }.toMap
      val rows = row.getAs[Long]("__rows")
      val nulls = present.map(c =>
        c -> (rows - row.getAs[Long](s"__nn_$c"))).toMap
      (d, if (cols.isEmpty) None else Some(d -> cols), d -> rows,
        if (nulls.isEmpty) None else Some(d -> nulls))
    }
    Some(ClusterResult(entries.map(_._1).toSeq, entries.flatMap(_._2).toMap,
      entries.map(_._3).toMap, entries.flatMap(_._4).toMap))
  }

  // ------------------------------------------------------- data skipping

  /** Data dirs of version `v` that can contain rows with `colName` in
    * [lo, hi] per manifest stats — dirs without stats for the column stay
    * candidates (never prune on missing information). Comparisons run in
    * the kind's EXACT domain: integrals/timestamp-micros as BigInt,
    * decimals as BigDecimal, floats as double, strings in Spark's UTF8
    * byte order (Java String order differs above the BMP).
    */
  def candidateDirs(v: Long, colName: String, lo: Any, hi: Any): Seq[String] = {
    val m = manifest(v)
    m.dataDirs.filter(d => dirMayContain(m, d, colName,
      Some(Endpoint(lo.toString, inclusive = true)),
      Some(Endpoint(hi.toString, inclusive = true))))
  }

  private def statCompare(kind: String, a: String, b: String): Int =
    VersionedTable.statCompare(kind, a, b)

  /** Can dir `d` contain a row with `colName` inside the (endpointed)
    * bounds (either side optional = unbounded)? A strict lower bound
    * additionally prunes when the dir's max EQUALS it — no row can exceed
    * the max (symmetrically for a strict upper vs the min). Missing stats
    * keep the dir a candidate; a malformed bound (e.g. a string probe
    * against an int-kind column) also keeps it — pruning never risks
    * correctness on bad input.
    */
  private def dirMayContain(m: Manifest, d: String, colName: String,
                            lo: Option[Endpoint], hi: Option[Endpoint]): Boolean = {
    if (m.stats.get(d).exists(_.contains(rowsMarker))) return false // empty dir
    m.stats.get(d).flatMap(_.get(colName)) match {
      case Some(st) =>
        try {
          !(lo.exists { l =>
            val c = statCompare(st.kind, st.max, l.v)
            c < 0 || (c == 0 && !l.inclusive)
          } || hi.exists { h =>
            val c = statCompare(st.kind, st.min, h.v)
            c > 0 || (c == 0 && !h.inclusive)
          })
        } catch { case NonFatal(_) => true }
      case None => true
    }
  }

  /** Range read with manifest-level data skipping: only dirs whose
    * [min, max] overlaps [lo, hi] are opened, then the exact predicate
    * applies on top (stats prune dirs, they never decide rows). For a
    * timestamp column pass epoch MICROS bounds. The exact filter compares
    * in the column's NATIVE type (the bound literal is cast, the column is
    * not), so parquet row-group skipping still applies inside surviving
    * dirs. The big win is append-mostly tables whose tracked column grows
    * with time: a recent window touches the newest few dirs only.
    */
  def readRange(colName: String, lo: Any, hi: Any): DataFrame = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val colName0 = physName(m, colName)
    val dirs = candidateDirs(v, colName0, lo, hi)
    val targets = fileTargetsForBounds(dirs, Seq((colName0, lo, hi)))
    if (targets.isEmpty) return readVersion(v).limit(0)
    val df0 = readPathsOf(m, targets)
    val dt = df0.schema(colName0).dataType
    val (lb, hb) = dt match {
      case org.apache.spark.sql.types.TimestampType =>
        (timestamp_micros(lit(lo.toString.toLong)),
          timestamp_micros(lit(hi.toString.toLong)))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros → TS → NTZ in the session zone (UTC) — constant-folded
        (timestamp_micros(lit(lo.toString.toLong)).cast(dt),
          timestamp_micros(lit(hi.toString.toLong)).cast(dt))
      case _ => (lit(lo.toString).cast(dt), lit(hi.toString).cast(dt))
    }
    applyMapping(m, df0.filter(col(colName0) >= lb && col(colName0) <= hb))
  }

  /** Multi-column range read: dirs must overlap EVERY `(col, lo, hi)` bound
    * to stay candidates (per-column candidate sets intersect), then the
    * exact conjunction applies on top. This is where Z-order clustering
    * pays off twice: a clustered table's chunks are selective on every
    * cluster column at once, so a 2-column band prunes multiplicatively
    * where a linear sort would only prune on its leading column. Bounds use
    * the same conventions as [[readRange]] (epoch micros for timestamps).
    */
  def readRangeMulti(bounds: Seq[(String, Any, Any)]): DataFrame = {
    require(bounds.nonEmpty, "readRangeMulti requires at least one bound")
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val bounds0 = bounds.map { case (c, lo, hi) => (physName(m, c), lo, hi) }
    val dirs = bounds0
      .map { case (c, lo, hi) => candidateDirs(v, c, lo, hi).toSet }
      .reduce(_ intersect _)
    // keep manifest order (deterministic file listing) after the set math
    val targets =
      fileTargetsForBounds(m.dataDirs.filter(dirs.contains), bounds0)
    if (targets.isEmpty) return readVersion(v).limit(0)
    val df = readPathsOf(m, targets)
    applyMapping(m, bounds0.foldLeft(df) { case (acc, (c, lo, hi)) =>
      val dt = acc.schema(c).dataType
      val (lb, hb) = dt match {
        case org.apache.spark.sql.types.TimestampType =>
          (timestamp_micros(lit(lo.toString.toLong)),
            timestamp_micros(lit(hi.toString.toLong)))
        case org.apache.spark.sql.types.TimestampNTZType =>
          (timestamp_micros(lit(lo.toString.toLong)).cast(dt),
            timestamp_micros(lit(hi.toString.toLong)).cast(dt))
        case _ => (lit(lo.toString).cast(dt), lit(hi.toString).cast(dt))
      }
      acc.filter(col(c) >= lb && col(c) <= hb)
    })
  }

  /** Transparent data skipping: read the latest snapshot under an ARBITRARY
    * predicate, pruning dirs by evaluating the predicate's boolean tree
    * against the manifest ledgers ([[mayMatch]]): AND intersects candidate
    * sets, OR unions them; leaves prune from range/equality bounds on
    * tracked columns (`>=`, `>`, `<=`, `<`, `=`, `BETWEEN`, `IN`,
    * `startsWith`, either operand order; strict bounds prune with their
    * closed relaxation — a superset, never a miss) and from the null-count
    * ledger for IS NULL (skip dirs with zero nulls) / IS NOT NULL (skip
    * all-null dirs). Sub-trees the extractor does not understand (NOT,
    * functions, untracked columns) contribute no bounds and prune nothing;
    * the FULL predicate always applies on top, so extraction quality
    * affects only how much gets skipped, never the result. This is the
    * Delta-style read path where skipping is an optimizer concern, not a
    * caller API — [[readRange]]/[[readRangeMulti]] remain for callers that
    * want to pass stat-domain bounds (e.g. epoch micros) explicitly.
    */
  def readWhere(predicate: Column): DataFrame = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val targets = scanTargetsFor(v, predicate)
    if (targets.isEmpty) readVersion(v).limit(0).filter(predicate)
    // filter AFTER the mapping projection (logical names); Catalyst pushes
    // it back through the aliases, so parquet-level pushdown is unchanged
    else applyMapping(m, readPathsOf(m, targets)).filter(predicate)
  }

  /** [[readWhere]] pinned to an explicit snapshot — the DSv2 scan path
    * ([[GraftDataSource]]): identical dir + file pruning, DV anti-join,
    * and column-mapping projection, but against `v` rather than the
    * latest version, so a time-travel scan stays stable across commits
    * that land while the query runs.
    */
  private[sources] def readWhereAt(v: Long, predicate: Option[Column]): DataFrame = {
    val m = manifest(v)
    predicate match {
      case None => applyMapping(m, readDirsOf(m, m.dataDirs))
      case Some(p) =>
        val targets = scanTargetsFor(v, p)
        if (targets.isEmpty) readVersion(v).limit(0).filter(p)
        else applyMapping(m, readPathsOf(m, targets)).filter(p)
    }
  }

  /** Resolved scan paths for the DSv2 delegated-parquet path: the pruned
    * file/dir set under `predicate`, or the full snapshot when the scan
    * carries no usable filter. Paths are absolute (rooted at the table).
    */
  private[sources] def scanTargetPathsAt(v: Long, predicate: Option[Column]): Seq[String] =
    predicate match {
      case Some(p) => scanTargetsFor(v, p)
      case None    => manifest(v).dataDirs.map(d => new Path(rootPath, d).toString)
    }

  /** Physical (file) schema of snapshot `v`, when tracked. */
  private[sources] def physSchemaAt(v: Long): Option[StructType] = physSchemaOf(v)

  /** Committed dirs as absolute paths (DSv2 limit bounding). */
  private[sources] def dirPathsOf(dirs: Seq[String]): Seq[String] =
    dirs.map(d => new Path(rootPath, d).toString)

  /** LOGICAL names of columns with any skipping ledger at snapshot `v`
    * (min/max stats or null counts recorded by some writer handle) — the
    * columns a runtime filter can actually prune by, reported to Catalyst
    * as the DSv2 scan's `filterAttributes`.
    */
  private[sources] def statTrackedLogicalAt(v: Long): Seq[String] = {
    val m = manifest(v)
    val phys = (m.stats.valuesIterator.flatMap(_.keysIterator) ++
      m.dirNulls.valuesIterator.flatMap(_.keysIterator))
      .filterNot(_ == rowsMarker).toSeq.distinct
    if (m.colMap.isEmpty) phys
    else {
      val p2l = m.colMap.toMap
      phys.flatMap(p2l.get)
    }
  }

  /** True when snapshot `v` needs the readWhere machinery beyond a plain
    * parquet scan (column-mapping overlay or merge-on-read deletes).
    */
  private[sources] def needsOverlayAt(v: Long): Boolean = {
    val m = manifest(v)
    m.colMap.nonEmpty || m.dvs.nonEmpty
  }

  /** The resolved scan set [[readWhere]] opens for `predicate`: the
    * manifest's dir stats prune whole directories first, then each
    * surviving dir's [[fileStatsName]] sidecar (when present) prunes
    * individual part files with the SAME boolean-tree test at file grain.
    * A dir without a sidecar contributes its whole path; a sidecar'd dir
    * contributes only the part files whose stats overlap — possibly none.
    * Exposed so specs and self-gating queries can pin file-level skipping.
    */
  private[graft] def scanTargetsFor(v: Long, predicate: Column): Seq[String] = {
    val m = manifest(v)
    // resolve against the LOGICAL schema (the predicate's world), then
    // translate the tree physical-ward — stats ledgers are keyed physically
    val schema = schemaOf(v).getOrElse(rawDirs(m, m.dataDirs).schema)
    VersionedTable.resolveCondition(spark, schema, predicate) match {
      case None => m.dataDirs.map(d => new Path(rootPath, d).toString)
      case Some(cond) =>
        val tree = VersionedTable.pushNotDown(toPhysicalExpr(m, cond))
        val kept = m.dataDirs.filter(d => VersionedTable.mayMatch(tree,
          dirMayContain(m, d, _, _, _), dirNullMayMatch(m, d, _, _),
          dirMayContainOther(m, d, _, _)))
        fileTargets(kept, tree)
    }
  }

  /** Sidecar pass over already-dir-pruned `dirs`: each dir with a
    * [[fileStatsName]] sidecar contributes only the part files whose
    * stats survive `tree` at file grain (possibly none); a sidecar-less
    * dir contributes its whole path. Shared by [[scanTargetsFor]] and the
    * explicit-bound readers ([[readRange]]/[[readRangeMulti]]/
    * [[readPoint]]), which dir-prune with exact stat-domain bounds first.
    */
  private def fileTargets(dirs: Seq[String],
      tree: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] =
    dirs.flatMap { d =>
      fileStatsFor(d) match {
        case Some(fstats) => fstats.toSeq.sortBy(_._1).collect {
          case (f, st) if VersionedTable.mayMatch(tree,
            fileMayContain(st, _, _, _), fileNullMayMatch(st, _, _),
            fileMayContainOther(st, _, _)) =>
            new Path(new Path(rootPath, d), f).toString
        }
        case None => Seq(new Path(rootPath, d).toString)
      }
    }

  /** [[fileTargets]] from explicit per-column stat-domain bounds (the
    * [[readRange]]-family contract, e.g. epoch micros for timestamps):
    * the bound set becomes a conjunction of closed range leaves — no
    * Column-expression extraction involved, so pruning exactness matches
    * [[candidateDirs]]'s.
    */
  private def fileTargetsForBounds(dirs: Seq[String],
      bounds: Seq[(String, Any, Any)]): Seq[String] =
    dirs.flatMap { d =>
      fileStatsFor(d) match {
        case Some(fstats) => fstats.toSeq.sortBy(_._1).collect {
          case (f, st) if bounds.forall { case (c, lo, hi) =>
            fileMayContain(st, c,
              Some(Endpoint(lo.toString, inclusive = true)),
              Some(Endpoint(hi.toString, inclusive = true)))
          } => new Path(new Path(rootPath, d), f).toString
        }
        case None => Seq(new Path(rootPath, d).toString)
      }
    }

  /** [[dirMayContain]] at file grain, judged from one sidecar entry. The
    * extra refinement over the dir test: a column with NO stats entry in a
    * non-empty file is all-null there (the sidecar always records stats
    * for a column with any non-null value), and no range/equality leaf is
    * TRUE on null — so the file prunes, exactly like an all-null dir under
    * the null ledger.
    */
  private def fileMayContain(st: FileStat, colName: String,
                             lo: Option[Endpoint], hi: Option[Endpoint]): Boolean = {
    if (st.rows == 0L) return false
    st.stats.get(colName) match {
      case Some(cs) =>
        try {
          !(lo.exists { l =>
            val c = statCompare(cs.kind, cs.max, l.v)
            c < 0 || (c == 0 && !l.inclusive)
          } || hi.exists { h =>
            val c = statCompare(cs.kind, cs.min, h.v)
            c > 0 || (c == 0 && !h.inclusive)
          })
        } catch { case NonFatal(_) => true }
      case None => st.nulls.get(colName) match {
        case Some(n) if n == st.rows => false // all-null file: no value leaf
        case _                       => true  // untracked column: keep
      }
    }
  }

  private def fileNullMayMatch(st: FileStat, colName: String,
                               wantNull: Boolean): Boolean = {
    if (st.rows == 0L) return false
    st.nulls.get(colName) match {
      case Some(n) if wantNull => n > 0
      case Some(n)             => n < st.rows
      case None                => true
    }
  }

  private def fileMayContainOther(st: FileStat, colName: String,
                                  v: String): Boolean = {
    if (st.rows == 0L) return false
    st.stats.get(colName) match {
      case Some(cs) =>
        try !(statCompare(cs.kind, cs.min, v) == 0 &&
          statCompare(cs.kind, cs.max, v) == 0)
        catch { case NonFatal(_) => true }
      case None => st.nulls.get(colName) match {
        case Some(n) if n == st.rows => false // only nulls: ≠ never TRUE
        case _                       => true
      }
    }
  }

  /** The dirs of version `v` that survive [[readWhere]]-style pruning for
    * `predicate` — exposed so specs and self-gating queries can pin how
    * much a predicate actually skips.
    */
  private[graft] def skipDirsFor(v: Long, predicate: Column): Seq[String] = {
    val m = manifest(v)
    val schema = schemaOf(v).getOrElse(rawDirs(m, m.dataDirs).schema)
    VersionedTable.resolveCondition(spark, schema, predicate) match {
      case None => m.dataDirs
      case Some(cond) =>
        val pruneTree = VersionedTable.pushNotDown(toPhysicalExpr(m, cond))
        m.dataDirs.filter(d =>
          VersionedTable.mayMatch(pruneTree, dirMayContain(m, d, _, _, _),
            dirNullMayMatch(m, d, _, _), dirMayContainOther(m, d, _, _)))
    }
  }

  /** Can dir `d` hold a row where `colName ≠ v` is TRUE? False only when
    * the stats prove the dir holds nothing but `v` and nulls (min = max =
    * v — nulls never make ≠ TRUE, so they don't rescue the dir). Missing
    * stats or a malformed compare keep the dir, as everywhere.
    */
  private def dirMayContainOther(m: Manifest, d: String, colName: String,
                                 v: String): Boolean = {
    if (m.stats.get(d).exists(_.contains(rowsMarker)) ||
      m.dirRows.get(d).contains(0L)) return false
    m.stats.get(d).flatMap(_.get(colName)) match {
      case Some(st) =>
        try !(statCompare(st.kind, st.min, v) == 0 &&
          statCompare(st.kind, st.max, v) == 0)
        catch { case NonFatal(_) => true }
      case None => true
    }
  }

  /** Can dir `d` contain a row where `colName` IS NULL (`wantNull`) /
    * IS NOT NULL (!`wantNull`)? Judged from the per-dir null-count ledger;
    * missing information (pre-ledger dir, untracked column, unknown row
    * count) keeps the dir a candidate. An all-null dir is exactly where
    * min/max stats go blind — no non-null value means no stats entry — so
    * the null ledger is what lets IS NOT NULL skip it.
    */
  private def dirNullMayMatch(m: Manifest, d: String, colName: String,
                              wantNull: Boolean): Boolean = {
    if (m.stats.get(d).exists(_.contains(rowsMarker)) ||
      m.dirRows.get(d).contains(0L)) return false // empty dir matches nothing
    m.dirNulls.get(d).flatMap(_.get(colName)) match {
      case Some(nulls) if wantNull => nulls > 0
      case Some(nulls) => m.dirRows.get(d) match {
        case Some(rows) => nulls < rows
        case None       => true
      }
      case None => true
    }
  }

  /** Data dirs of the LATEST version that might contain `colName = value`:
    * min/max stats prune first (free — already in the manifest), then each
    * survivor's bloom sidecar is probed. A dir without a sidecar (written
    * before the column was bloom-tracked, foreign clone ref) stays a
    * candidate — skipping never prunes on missing information. Blooms are
    * what min/max cannot be for high-cardinality unsorted keys: on an
    * append-mostly table every dir spans nearly the full key range, so
    * range stats keep every dir, while membership prunes all but the ~1
    * dir that actually holds the key (+fpp false positives).
    */
  def pointCandidateDirs(colName: String, value: Any): Seq[String] = {
    require(value != null, "point lookup value must be non-null")
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val ranged = candidateDirs(v, colName, value, value)
    val kind = manifest(v).schemaJson
      .map(j => statKind(parseSchema(j)(colName).dataType))
    ranged.filter { d =>
      bloomFor(d, colName) match {
        case Some(bf) => kind match {
          case Some("int") => bf.mightContainLong(value.toString.toLong)
          case _           => bf.mightContainString(value.toString)
        }
        case None => true
      }
    }
  }

  /** The dirs a key-set read must open — the pruning engine behind
    * [[readMatching]], exposed so specs and self-gating queries can pin
    * how much a dimension filter actually skips. Stats envelope first
    * (min/max of the keys, free), then per-dir bloom membership when the
    * distinct key set is small enough to collect (≤ `maxProbeKeys`); a
    * too-large key set degrades to the envelope, never to wrong.
    */
  private[graft] def matchingDirs(keys: DataFrame, colName: String,
                                  maxProbeKeys: Int = 10000): Seq[String] = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val colP = physName(m, colName)
    val k0 = keys.select(col(colName).as(colP)).distinct()
    val r = k0.agg(min(statValExpr(k0, colP)).as("lo"),
      max(statValExpr(k0, colP)).as("hi")).head()
    if (r.isNullAt(0)) return Seq.empty // only null keys: nothing matches
    val ranged = candidateDirs(v, colP, r.get(0), r.get(1))
    val probe = k0.na.drop(Seq(colP)).limit(maxProbeKeys + 1).collect()
    if (probe.length > maxProbeKeys) ranged
    else {
      val kind = m.schemaJson
        .map(j => statKind(parseSchema(j)(colP).dataType))
      ranged.filter { d =>
        bloomFor(d, colP) match {
          case Some(bf) => probe.exists { row =>
            kind match {
              case Some("int") => bf.mightContainLong(row.get(0).toString.toLong)
              case _           => bf.mightContainString(row.get(0).toString)
            }
          }
          case None => true
        }
      }
    }
  }

  /** EXPLAIN for data skipping: per data dir of the latest version, what
    * a [[readWhere]] of `predicate` would do — opened or pruned, the
    * ledger row count, and (for sidecar'd dirs) how many part files
    * survive file-grain pruning. Metadata-only: nothing is read but the
    * manifest and sidecars, so it is safe to call on a 100 TB table to
    * see why a scan opens what it opens.
    */
  def scanReport(predicate: Column): DataFrame = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val targets = scanTargetsFor(v, predicate)
    val rows = m.dataDirs.map { d =>
      val prefix = new Path(rootPath, d).toString
      val mine = targets.filter(t => t == prefix || t.startsWith(prefix + "/"))
      val filesTotal = fileStatsFor(d).map(_.size)
      val filesOpened =
        if (mine.isEmpty) Some(0)
        else if (mine.exists(_ == prefix)) filesTotal // whole-dir read
        else Some(mine.size)
      (d, mine.nonEmpty, m.dirRows.get(d),
        filesTotal.map(_.toLong), filesOpened.map(_.toLong))
    }
    import spark.implicits._
    rows.toDF("dir", "opened", "ledger_rows", "files_total", "files_opened")
  }

  /** Dimension-driven fact read (runtime filtering — the dynamic-
    * partition-pruning idea at dir grain): rows whose `colName` appears in
    * `keys`, opening only [[matchingDirs]]. The stats envelope handles
    * range-clustered tables; the bloom pass handles append-mostly tables
    * where every dir spans the key range and min/max alone keeps them all.
    * The exact semi-join (AQE-broadcast at dimension size) decides rows —
    * sidecars only ever decide dirs, so a bloom false positive costs one
    * extra dir read, never a wrong row.
    */
  def readMatching(keys: DataFrame, colName: String,
                   maxProbeKeys: Int = 10000): DataFrame = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val dirs = matchingDirs(keys, colName, maxProbeKeys)
    if (dirs.isEmpty) return readVersion(v).limit(0)
    applyMapping(m, readDirsOf(m, dirs))
      .join(keys.select(col(colName)).distinct(), Seq(colName), "left_semi")
  }

  /** Point read (`colName = value`) with bloom + min/max data skipping:
    * only [[pointCandidateDirs]] are opened, then the exact equality
    * predicate applies on top (sidecars prune dirs, they never decide
    * rows — a false positive just reads one extra dir). For a timestamp
    * column pass epoch MICROS, as in [[readRange]].
    */
  def readPoint(colName: String, value: Any): DataFrame = {
    val v = latestVersion.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val m = manifest(v)
    val colName0 = physName(m, colName)
    val dirs = pointCandidateDirs(colName0, value)
    val targets = fileTargetsForBounds(dirs, Seq((colName0, value, value)))
    if (targets.isEmpty) return readVersion(v).limit(0)
    val df = readPathsOf(m, targets)
    val dt = df.schema(colName0).dataType
    val bound = dt match {
      case org.apache.spark.sql.types.TimestampType =>
        timestamp_micros(lit(value.toString.toLong))
      case org.apache.spark.sql.types.TimestampNTZType =>
        timestamp_micros(lit(value.toString.toLong)).cast(dt)
      case _ => lit(value.toString).cast(dt)
    }
    applyMapping(m, df.filter(col(colName0) === bound))
  }

  /** Commit operations that provably keep carried-dir key membership
    * version-invariant, so the CDF diff may prune to the manifests'
    * symmetric-difference dirs: read-modify-write ops rewrite every dir a
    * touched key lives in (merge/update/delete families), dir-set swaps
    * replace whole snapshots (overwrite/restore/compact/clone), and
    * metadata ops move no rows at all. BLIND APPENDS are absent on
    * purpose: an append may add a key that already lives in a carried dir
    * (a key-uniqueness violation the append path cannot see), and only
    * the full diff reports that shape faithfully.
    */
  private val cdfSafeOps: Set[String] = Set(
    "merge", "merge_into", "update", "delete", "delete_dv",
    "overwrite", "restore", "compact", "compact_small",
    "compact_clustered", "compact_clustered_incr", "clone",
    "rename_column", "add_column", "drop_column", "widen_column")

  /** Carried dirs (present in BOTH manifests) whose DV-effective content
    * still differs: a deletion-vector commit touches rows of a dir without
    * rewriting it, so path identity alone does not prove content identity.
    * The DV frames are tiny (deleted positions only) — their symmetric
    * difference collects a bounded file list that maps back to owning
    * dirs by path containment.
    */
  private def dvTouchedCarried(mFrom: Manifest, mTo: Manifest,
                               carried: Set[String]): Set[String] = {
    if (carried.isEmpty || mFrom.dvs == mTo.dvs) return Set.empty
    val diff = (dvFrame(mFrom), dvFrame(mTo)) match {
      case (None, None)       => return Set.empty
      case (Some(x), None)    => x
      case (None, Some(y))    => y
      case (Some(x), Some(y)) => x.exceptAll(y).unionAll(y.exceptAll(x))
    }
    val files = diff.select(col(dvFileCol)).distinct()
      .collect().map(_.getString(0))
    if (files.isEmpty) return Set.empty
    def owns(dir: String, file: String): Boolean = {
      val d = new Path(dir).toUri.getPath
      val f = new Path(file).toUri.getPath
      f.startsWith(d + "/") || f.contains("/" + d + "/")
    }
    carried.filter(d => files.exists(f => owns(d, f)))
  }

  /** The pruned per-side dir lists for a CDF diff `from` → `to`: carried
    * dirs are byte-identical by path (data dirs are immutable once
    * committed), so they can only produce diff rows through a DV change —
    * everything else the diff needs lives in the manifests' symmetric
    * difference. For the KEYED diff this is lossless only when carried-dir
    * key membership is version-invariant across the window, so `keyed`
    * additionally requires every commit in `(from, to]` to be a
    * [[cdfSafeOps]] member (and the window un-vacuumed); otherwise the
    * full dir lists return and the caller pays the legacy two-snapshot
    * diff. The ROW-GRAIN multiset diff needs no such proof — carried
    * multiplicities cancel exactly in `exceptAll` — so `keyed = false`
    * prunes unconditionally. Package-visible so specs can pin that a
    * narrow MERGE's change read opens only the touched dirs.
    */
  private[graft] def cdfChangedDirs(from: Long, to: Long,
                                    keyed: Boolean): (Seq[String], Seq[String]) = {
    val mFrom = manifest(from)
    val mTo = manifest(to)
    val full = (mFrom.dataDirs, mTo.dataDirs)
    if (keyed) {
      val lo = math.min(from, to); val hi = math.max(from, to)
      val window = (lo + 1) to hi
      val known = versions.toSet
      val safe = window.forall(v => known.contains(v) &&
        cdfSafeOps.contains(manifest(v).operation))
      if (!safe) return full
    }
    val carried = mFrom.dataDirs.toSet.intersect(mTo.dataDirs.toSet)
    val touched = dvTouchedCarried(mFrom, mTo, carried)
    (mFrom.dataDirs.filterNot(d => carried(d) && !touched(d)),
      mTo.dataDirs.filterNot(d => carried(d) && !touched(d)))
  }

  /** DV-aware read of one diff side in physical schema `phys`; an empty
    * dir list becomes an empty in-memory frame — no FS touch, no scan.
    */
  private def cdfSide(m: Manifest, dirs: Seq[String],
                      phys: StructType): DataFrame =
    if (dirs.isEmpty)
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), phys)
    else {
      val raw = readDirsOf(m, dirs)
      if (raw.schema == phys) raw else align(raw, phys)
    }

  /** Change data feed between two committed snapshots: rows in `to` but
    * not `from` are inserts, rows in `from` but not `to` are deletes (an
    * update surfaces as a delete+insert pair — row-grain diff, no key
    * knowledge required). Multiset semantics via `exceptAll`, so duplicate
    * rows diff correctly. Across an additive evolution the diff runs in
    * `to`'s schema (`from` aligns, old rows carry nulls). Cost:
    * O(changed dirs), not O(table) — the diff reads only the manifests'
    * symmetric-difference (plus DV-touched) dirs via [[cdfChangedDirs]];
    * carried-dir multiplicities cancel exactly in the multiset algebra,
    * so the pruning is unconditionally lossless at matching schemas. A
    * schema/mapping change between the versions falls back to the legacy
    * full two-snapshot diff (align-by-name across a rename would
    * otherwise report different rows than the historical semantics).
    */
  def changes(from: Long, to: Long): DataFrame = {
    // a single materialized transition reads its change FILE — O(changed
    // rows), no diff join at all (write-time CDF, [[maybeWriteChangeData]])
    if (to == from + 1) readChangeData(to) match {
      case Some(cd) => return cd
      case None     => ()
    }
    val sameShape = schemaOf(from) == schemaOf(to) &&
      manifest(from).colMap == manifest(to).colMap
    val (fromDirs, toDirs) =
      if (sameShape) cdfChangedDirs(from, to, keyed = false)
      else (manifest(from).dataDirs, manifest(to).dataDirs)
    val mTo = manifest(to); val mFrom = manifest(from)
    val physTo = physSchemaOf(to).getOrElse(
      readDirsOf(mTo, mTo.dataDirs).schema)
    val physFrom = physSchemaOf(from).getOrElse(
      readDirsOf(mFrom, mFrom.dataDirs).schema)
    val b = applyMapping(mTo, cdfSide(mTo, toDirs, physTo))
    val a0 = applyMapping(mFrom, cdfSide(mFrom, fromDirs, physFrom))
    val a = if (a0.schema == b.schema) a0 else align(a0, b.schema)
    b.exceptAll(a).withColumn("_change_type", lit("insert"))
      .unionAll(a.exceptAll(b).withColumn("_change_type", lit("delete")))
  }

  /** KEYED change feed (Delta-CDF-shaped): classifies changes between two
    * snapshots by `keyCols` — `insert` (key only in `to`), `delete` (key
    * only in `from`), and a `update_preimage`/`update_postimage` pair when
    * the key exists in both with any non-key column differing. One full
    * outer join on the key (single shuffle; the four outputs reuse the
    * joined exchange). Field-level null changes count as changes (struct
    * equality is per-field, null==null). Requires key-unique snapshots —
    * exactly what merge-maintained tables guarantee; on duplicate keys the
    * join would fan out.
    *
    * Cost: O(changed dirs) whenever every commit in the window is a
    * [[cdfSafeOps]] member — the join's two inputs are only the
    * symmetric-difference (plus DV-touched) dirs, so reading one narrow
    * MERGE's changes on a 100-TB table scans two dirs, not two snapshots.
    * Key-uniqueness makes the pruning lossless: a key living in an
    * untouched carried dir lives there in BOTH versions with identical
    * bytes (it cannot also live in an added/removed dir without
    * duplicating inside a snapshot), so it can never produce a change
    * row. Windows containing a blind append (which CAN break that
    * invariant invisibly) or a vacuumed commit fall back to the legacy
    * full two-snapshot diff.
    */
  def changesByKey(from: Long, to: Long, keyCols: Seq[String]): DataFrame = {
    val (a, b) = changesByKeySides(from, to)
    VersionedTable.keyedDiff(a, b, keyCols)
  }

  /** The two pruned, DV-applied diff sides of `from` → `to`, presented in
    * `to`'s logical names — exactly what [[changesByKey]] joins. Exposed
    * so the PARTITIONED change feed can union the moved members' sides
    * and run ONE keyed join per snapshot transition (keys + the partition
    * column) instead of one join per moved member — collapsing the
    * wide-window plan from O(snapshots × moved partitions) joins to
    * O(snapshots).
    */
  private[sources] def changesByKeySides(from: Long,
                                         to: Long): (DataFrame, DataFrame) = {
    // a single materialized transition derives both sides from the
    // change FILE: the multiset-diff deletes ARE the from-side surplus
    // and the inserts the to-side surplus, so the keyed join over them
    // equals the keyed join over the full snapshots under the operator's
    // key-uniqueness contract — O(changed rows) instead of re-reading
    // the rewritten dirs
    if (to == from + 1) readChangeData(to) match {
      case Some(cd) =>
        return (cd.filter(col("_change_type") === "delete")
          .drop("_change_type"),
          cd.filter(col("_change_type") === "insert")
            .drop("_change_type"))
      case None => ()
    }
    // diff in PHYSICAL space, present in `to`'s logical names: physical
    // identity is stable across renames, so a metadata-only RENAME between
    // the two versions yields ZERO change rows instead of a false
    // every-key update wall; a column dropped by `to` leaves the diff.
    val mTo = manifest(to)
    val physTo = physSchemaOf(to).getOrElse(
      readDirsOf(mTo, mTo.dataDirs).schema)
    val mFrom = manifest(from)
    val (fromDirs, toDirs) = cdfChangedDirs(from, to, keyed = true)
    (applyMapping(mTo, cdfSide(mFrom, fromDirs, physTo)),
      applyMapping(mTo, cdfSide(mTo, toDirs, physTo)))
  }

  // -------------------------------------------------------------- vacuum

  /** Drop data directories referenced ONLY by versions older than the
    * newest `keepVersions` manifests (and those manifests themselves).
    * Bounds storage growth of copy-on-write; keepVersions >= 1.
    *
    * The orphan sweep (data dirs no manifest references — losing writers,
    * crashed commits) only removes directories older than
    * `orphanRetentionMs`, because an IN-FLIGHT writer's data exists before
    * its manifest does: sweeping young unreferenced dirs would corrupt a
    * commit that is about to succeed (same reason Delta's VACUUM has a
    * retention window).
    */
  def vacuum(keepVersions: Int = 2,
             orphanRetentionMs: Long = 60 * 60 * 1000L): Unit = {
    require(keepVersions >= 1, "must keep at least the latest version")
    vacuumKeeping(versions.takeRight(keepVersions).toSet, orphanRetentionMs)
  }

  /** Time-based retention (VACUUM … RETAIN n HOURS): drop versions that
    * were SUPERSEDED before `cutoffMs` — a version is still "current" for
    * time travel until the next commit replaces it, so the keep test is on
    * the successor's timestamp, not the version's own (a snapshot written
    * a year ago but still latest must never vacuum). The latest version is
    * always kept.
    */
  def vacuumOlderThan(cutoffMs: Long,
                      orphanRetentionMs: Long = 60 * 60 * 1000L): Unit = {
    val vs = versions
    if (vs.isEmpty) return
    val supersededAt = vs.zip(vs.tail).map { case (v, next) =>
      v -> manifest(next).timestampMs
    }.toMap // last version has no successor → always kept
    vacuumKeeping(
      vs.filter(v => supersededAt.get(v).forall(_ >= cutoffMs)).toSet,
      orphanRetentionMs)
  }

  /** Versions SUPERSEDED at/after `cutoffMs` — each version is "current"
    * until the next commit replaces it, so the age test is on the
    * SUCCESSOR's timestamp (the latest version has no successor and is
    * never in this set; [[vacuumKeeping]] keeps it unconditionally).
    * [[MultiTableTxn.vacuum]] folds this into its keep set: a member
    * version committed by an in-flight multi-table stage, superseded by a
    * concurrent writer before its transaction stamps, is pinned by NO
    * live transaction yet — without this floor a concurrent vacuum would
    * reclaim it immediately and the subsequent stamp would produce a
    * committed transaction whose readAt fails. Same in-flight window the
    * orphan-dir sweep honors.
    */
  def supersededSince(cutoffMs: Long): Set[Long] = {
    val vs = versions
    vs.zip(vs.tail).collect {
      case (v, next) if manifest(next).timestampMs >= cutoffMs => v
    }.toSet
  }

  /** Vacuum keeping an EXPLICIT version set (the latest version is always
    * kept regardless): the coordinator layer
    * ([[PartitionedVersionedTable.vacuum]]) uses this to preserve exactly
    * the versions still referenced by live cross-partition snapshots —
    * a count-based retention can't express "keep what snapshot 3 pinned".
    */
  def vacuumKeeping(keep: Set[Long],
                    orphanRetentionMs: Long = 60 * 60 * 1000L): Unit = {
    val vs = versions
    if (vs.isEmpty) return
    val keepAll = keep + vs.last
    val (drop, keepList) = vs.partition(v => !keepAll.contains(v))
    val live = keepList.flatMap(manifest(_).dataDirs).toSet
    val liveDvs = keepList.flatMap(manifest(_).dvs).toSet
    // a dropped manifest may be the ONLY record of a streaming epoch: the
    // per-query sidecar is written AFTER the table commit, so a writer
    // that crashed in between left the manifest ledger entry as the sole
    // witness. Fold every dropped stream-append watermark into its
    // sidecar BEFORE the manifest goes away — exactly-once must survive
    // any retention policy.
    drop.iterator.map(manifest(_).operation)
      .filter(_.startsWith("stream_append:"))
      .flatMap { op =>
        val rest = op.stripPrefix("stream_append:")
        val i = rest.lastIndexOf(':')
        if (i <= 0) None
        else rest.substring(i + 1).toLongOption.map(rest.substring(0, i) -> _)
      }
      .toSeq.groupMapReduce(_._1)(_._2)(math.max)
      .foreach { case (qid, n) =>
        if (!streamLedgerSidecar(qid).exists(_ >= n)) streamLedgerPut(qid, n)
      }
    drop.foreach { v =>
      // foreign (clone-referenced) dirs belong to the source table: this
      // table's vacuum must never reach into another root
      manifest(v).dataDirs.filterNot(live).filterNot(isForeign)
        .foreach { d =>
          val abs = new Path(rootPath, d)
          // probe BEFORE the delete: only bucketed dirs carry catalog
          // registrations, and an unconditional dropTable here would be
          // O(deleted dirs) metastore RPCs on a never-bucketed table
          val wasBucketed = fs.exists(new Path(abs, bucketSpecName))
          fs.delete(abs, true)
          // retire the dir's bucketed-layout catalog registration WITH
          // the dir (primary cleanup; the cold-read sweep is fallback)
          if (wasBucketed) dropBucketReg(abs.toString)
        }
      manifest(v).dvs.filterNot(liveDvs).filterNot(isForeign)
        .foreach(d => fs.delete(new Path(rootPath, d), true))
      // a dropped version's materialized change file describes a
      // transition that can no longer replay — sweep it with the manifest
      if (fs.exists(changeDataDir(v))) fs.delete(changeDataDir(v), true)
      fs.delete(manifestPath(v), false)
      manifestCache.remove(v)
    }
    // orphans from losing/crashed writers, past the in-flight window;
    // prefix match, because a clustered commit registers chunk SUBdirs —
    // its parent dir is live even though it is not itself a manifest entry
    val dataRoot = new Path(rootPath, "data")
    if (fs.exists(dataRoot)) {
      val all = versions.flatMap(manifest(_).dataDirs).toSet
      val cutoff = System.currentTimeMillis() - orphanRetentionMs
      fs.listStatus(dataRoot)
        .filter { st =>
          val name = s"data/${st.getPath.getName}"
          !all.exists(d => d == name || d.startsWith(s"$name/")) &&
            st.getModificationTime < cutoff
        }
        .foreach { st =>
          val wasBucketed = fs.exists(new Path(st.getPath, bucketSpecName))
          fs.delete(st.getPath, true)
          // same spelling bucketSpecOf hashes: rootPath-resolved rel dir
          if (wasBucketed) dropBucketReg(new Path(rootPath,
            s"data/${st.getPath.getName}").toString)
        }
    }
    // bucketed-write staging of crashed writers ([[overwriteBucketed]]
    // renames _staging/bkt-* into data/ before committing; a crash
    // between saveAsTable and the rename leaves the staged dir behind) —
    // same in-flight window as the data-orphan sweep
    val stagingRoot = new Path(rootPath, "_staging")
    if (fs.exists(stagingRoot)) {
      val cutoff = System.currentTimeMillis() - orphanRetentionMs
      fs.listStatus(stagingRoot)
        .filter(st => st.getPath.getName.startsWith("bkt-") &&
          st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    }
    // same sweep for deletion vectors of losing/crashed writers
    val dvRoot = new Path(rootPath, "dv")
    if (fs.exists(dvRoot)) {
      val allDvs = versions.flatMap(manifest(_).dvs).toSet
      val cutoff = System.currentTimeMillis() - orphanRetentionMs
      fs.listStatus(dvRoot)
        .filter(st => !allDvs.contains(s"dv/${st.getPath.getName}") &&
          st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    }
    // commit/checkpoint TEMP debris from crashed writers: a process that
    // died between `fs.create(tmp)` and the rename leaves `.tmp-*` /
    // `._cptmp-*` files in _txlog forever — readers never see them
    // (`versions` filters on the `.json` suffix) but they accumulate.
    // Same in-flight window as the data-orphan sweep: a LIVE writer's
    // tmp file exists for milliseconds before its rename.
    val logCutoff = System.currentTimeMillis() - orphanRetentionMs
    fs.listStatus(logPath)
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && (n.startsWith(".tmp-") || n.startsWith("._cptmp-")) &&
          st.getModificationTime < logCutoff
      }
      .foreach(st => fs.delete(st.getPath, false))
    // the checkpoint must not resurrect dropped versions for fresh handles
    if (drop.nonEmpty && fs.exists(checkpointPath)) writeCheckpoint()
  }
}

object VersionedTable {

  /** Session conf: "true" materializes a row-grain change file per
    * rewrite commit (the Delta `enableChangeDataFeed` analogue) — CDF
    * reads of those transitions become O(changed rows). Read per commit,
    * so a long-lived session can flip it.
    */
  val WriteCdfConf = "graft.cdf.write"

  /** The Delta-CDF-shaped keyed classification of two snapshot sides —
    * `insert` (key only in `b`), `delete` (key only in `a`), an
    * `update_preimage`/`update_postimage` pair when the key exists in
    * both with any non-key column differing. One full outer join on the
    * key; the four outputs reuse the joined exchange. Shared by the flat
    * [[VersionedTable.changesByKey]] and the partitioned feed's
    * per-transition cross-member join (keys + the partition column).
    */
  private[sources] def keyedDiff(a: DataFrame, b: DataFrame,
                                 keyCols: Seq[String]): DataFrame = {
    val valCols = b.columns.filterNot(keyCols.contains).toSeq
    val aK = a.select(keyCols.map(col) :+
      struct(valCols.map(col): _*).as("_vt_a"): _*)
    val bK = b.select(keyCols.map(col) :+
      struct(valCols.map(col): _*).as("_vt_b"): _*)
    val j = aK.join(bK, keyCols, "full_outer")
    def emit(side: String, tag: String, pred: Column) =
      j.filter(pred).select(keyCols.map(col) ++
        valCols.map(c => col(s"_vt_$side.$c").as(c)) :+
        lit(tag).as("_change_type"): _*)
    val changedBoth = col("_vt_a").isNotNull && col("_vt_b").isNotNull &&
      !(col("_vt_a") <=> col("_vt_b"))
    emit("b", "insert", col("_vt_a").isNull)
      .unionAll(emit("a", "delete", col("_vt_b").isNull))
      .unionAll(emit("a", "update_preimage", changedBoth))
      .unionAll(emit("b", "update_postimage", changedBoth))
  }

  /** One committed version: complete file-set state, not a delta.
    * `stats`: per-dir min/max of the table's tracked columns (the
    * data-skipping index; empty when the table tracks none).
    * `schemaJson`: the committed table schema (None on manifests written
    * before schema tracking — those tables are grandfathered). The schema
    * is always the PHYSICAL one — the column names and order of the
    * parquet files themselves. `colMap` is the column-mapping overlay
    * (Delta's `columnMapping` discipline): ordered (physical, logical)
    * pairs that define the USER-facing column set once a rename/drop has
    * happened. Empty means identity — physical IS logical, the pre-mapping
    * fast path every table starts on. A physical column absent from a
    * non-empty map is dropped: its bytes stay in files and in stats, reads
    * never project it, and its name is reserved (a re-added column of the
    * same logical name gets a fresh physical slot, so stale bytes can
    * never resurrect).
    */
  final case class Manifest(
      version: Long,
      operation: String,
      timestampMs: Long,
      dataDirs: Seq[String],
      stats: Map[String, Map[String, ColStats]] = Map.empty,
      schemaJson: Option[String] = None,
      dvs: Seq[String] = Nil,
      dirRows: Map[String, Long] = Map.empty,
      dirNulls: Map[String, Map[String, Long]] = Map.empty,
      colMap: Seq[(String, String)] = Nil)

  /** One freshly-written data dir: its manifest entries, gathered in the
    * single `observe` pass of the write (stats/rows/nulls cost no extra
    * scan). `nulls` is per tracked column — the ledger IS NULL / IS NOT
    * NULL pruning and metadata-only null counts read from.
    */
  private[graft] final case class DirWrite(
      dir: String,
      stats: Map[String, Map[String, ColStats]],
      rows: Long,
      nulls: Map[String, Long]) {
    def rowsEntry: Map[String, Long] = Map(dir -> rows)
    def nullsEntry: Map[String, Map[String, Long]] =
      if (nulls.isEmpty) Map.empty else Map(dir -> nulls)
  }

  /** Min/max in the comparison domain; kind = "int" | "num" | "dec" |
    * "str" | "rows" (the zero-rows marker under [[rowsMarker]]).
    */
  final case class ColStats(min: String, max: String, kind: String)

  /** One side of an extracted range bound: the rendered stat-domain value
    * plus whether the comparison includes it. Strict bounds used to prune
    * with their closed relaxation; carrying inclusivity lets `x > 49`
    * prune a dir whose max IS 49 — the boundary dir a closed relaxation
    * must keep.
    */
  final case class Endpoint(v: String, inclusive: Boolean)

  /** Pseudo-column marking a data dir with zero rows (always skippable). */
  val rowsMarker = "__vt_rows"

  /** Partition column name for clustered-compaction chunk subdirs. */
  val chunkCol = "_vt_chunk"

  /** Bloom sidecar filename prefix inside a data dir. The leading `_`
    * keeps Hadoop's default PathFilter (and so every parquet scan of the
    * dir) from reading it as data.
    */
  val bloomPrefix = "_bloom_"

  /** File-grain stats sidecar filename inside a data dir (hidden from
    * parquet listings by the leading `_`, like the bloom sidecars).
    */
  val fileStatsName = "_filestats.json"

  /** Bucket-layout sidecar filename inside an [[overwriteBucketed]] data
    * dir (hidden from parquet listings by the leading `_`): records
    * (nBuckets, bucketCols, sortCols) so [[readVersionBucketed]] can
    * surface the layout to the planner.
    */
  val bucketSpecName = "_buckets.json"

  /** One part file's slice of a dir's [[fileStatsName]] sidecar: row
    * count, stat-domain min/max per tracked column (absent for all-null
    * columns), and per-column null counts.
    */
  final case class FileStat(rows: Long, stats: Map[String, ColStats],
                            nulls: Map[String, Long])

  /** Column names of a deletion-vector parquet (file path + row index). */
  val dvFileCol = "__vt_dv_file"
  val dvRowCol = "__vt_dv_row"

  /** One WHEN clause of [[VersionedTable.mergeInto]] (SQL MERGE INTO
    * semantics, reference `silver.py:12-17` upsert discipline generalized
    * to the full three-arm statement). `cond` is the clause's AND
    * condition (None = unconditional); expressions reference TARGET
    * columns by their logical names and SOURCE columns by the names of
    * the source frame handed to `mergeInto` (which must be disjoint from
    * the target's — the SQL bridge renames them `__src_i`).
    */
  sealed trait MergeIntoAction { def cond: Option[Column] }

  /** WHEN [NOT] MATCHED ... THEN UPDATE SET — `set` maps target logical
    * column → new-value expression; unassigned columns keep their value.
    */
  final case class MergeIntoUpdate(cond: Option[Column],
                                   set: Map[String, Column])
    extends MergeIntoAction

  /** WHEN [NOT] MATCHED ... THEN DELETE. */
  final case class MergeIntoDelete(cond: Option[Column])
    extends MergeIntoAction

  /** WHEN NOT MATCHED THEN INSERT — `values` maps target logical column →
    * value expression over SOURCE columns; unassigned columns insert NULL.
    */
  final case class MergeIntoInsert(cond: Option[Column],
                                   values: Map[String, Column])
    extends MergeIntoAction

  final class ConcurrentWriteException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** An append/merge frame is incompatible with the committed table
    * schema (type conflict, or column drift without `mergeSchema`).
    */
  final class SchemaMismatchException(msg: String)
    extends RuntimeException(msg)

  /** Incoming rows failed a table CHECK constraint; nothing was committed. */
  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** One aggregate pass over every constraint; throws listing each violated
    * one with its row count. Shared by the flat table and the partitioned
    * wrapper (which validates the WHOLE frame before any partition commits,
    * keeping rejection all-or-nothing).
    */
  private[sources] def checkConstraints(df: DataFrame,
      constraints: Seq[(String, String)], op: String): Unit =
    if (constraints.nonEmpty) {
      val counters = constraints.map { case (name, e) =>
        sum(when(!coalesce(expr(e), lit(true)), 1L).otherwise(0L)).as(name)
      }
      val row = df.agg(counters.head, counters.tail: _*).head()
      val violated = constraints.zipWithIndex.collect {
        case ((name, e), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
          s"$name [$e]: ${row.getLong(i)} rows"
      }
      if (violated.nonEmpty)
        throw new ConstraintViolationException(
          s"$op rejected by CHECK constraints: ${violated.mkString("; ")}")
    }

  private val mapper = new ObjectMapper()

  /** JVM-local commit locks, one per table root (see `commit`'s doc). */
  private val rootLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def rootLock(root: String): Object =
    rootLocks.computeIfAbsent(root, _ => new Object)

  private def parseSchema(json: String): StructType =
    DataType.fromJson(json).asInstanceOf[StructType]

  /** Lossless type widening between two column types — the evolution
    * Delta calls type widening: integral upcasts within the
    * byte→short→int→long chain and float→double. Returns the wider of
    * the two, None when the pair is not a widening (string vs long,
    * long vs double, …). Widened columns stay in the SAME stat kind
    * ("int" / "num"), so recorded dir stats and bloom sidecars keep
    * comparing correctly, and Spark 4's parquet reader reads the old
    * narrower physical files under the widened schema natively.
    */
  private[sources] def widen(a: DataType, b: DataType): Option[DataType] = {
    import org.apache.spark.sql.types._
    val intChain: Seq[DataType] = Seq(ByteType, ShortType, IntegerType, LongType)
    val fpChain: Seq[DataType] = Seq(FloatType, DoubleType)
    def pick(chain: Seq[DataType]): Option[DataType] = {
      val (ra, rb) = (chain.indexOf(a), chain.indexOf(b))
      if (ra >= 0 && rb >= 0) Some(chain(math.max(ra, rb))) else None
    }
    if (a == b) Some(a) else pick(intChain).orElse(pick(fpChain))
  }

  /** Enforcement: type conflicts reject — except lossless widenings
    * ([[widen]]) under `allowEvolution`, where the committed column takes
    * the wider type. Column drift rejects unless `allowEvolution`, which
    * unions additively — table columns first, new columns appended
    * nullable; columns missing from the incoming frame stay (null-filled
    * by [[align]]).
    */
  private[sources] def evolve(prev: StructType, incoming: StructType,
                              allowEvolution: Boolean): StructType = {
    val prevByName = prev.fields.map(f => f.name -> f).toMap
    val conflicts = incoming.fields.filter { f =>
      prevByName.get(f.name).exists { p =>
        p.dataType != f.dataType &&
          !(allowEvolution && widen(p.dataType, f.dataType).isDefined)
      }
    }
    if (conflicts.nonEmpty)
      throw new SchemaMismatchException(conflicts.map(f =>
        s"${f.name}: table=${prevByName(f.name).dataType.simpleString} " +
          s"incoming=${f.dataType.simpleString}")
        .mkString("column type conflict: ", ", ", ""))
    val added = incoming.fields.filterNot(f => prevByName.contains(f.name))
    val missing = prev.fields.filterNot(f =>
      incoming.fieldNames.contains(f.name))
    if (!allowEvolution && (added.nonEmpty || missing.nonEmpty))
      throw new SchemaMismatchException(
        s"schema drift: added=[${added.map(_.name).mkString(",")}] " +
          s"missing=[${missing.map(_.name).mkString(",")}] " +
          "(pass mergeSchema = true for additive evolution)")
    val widened = prev.fields.map { p =>
      incoming.fields.find(_.name == p.name)
        .flatMap(f => if (allowEvolution) widen(p.dataType, f.dataType) else None)
        .map(dt => p.copy(dataType = dt)).getOrElse(p)
    }
    StructType(widened ++ added.map(_.copy(nullable = true)))
  }

  /** `df` projected INTO `target` column-for-column (missing → typed null),
    * plus `extras` appended — every data dir is physically written with
    * the full committed column set, in committed order.
    */
  private[sources] def align(df: DataFrame, target: StructType,
                             extras: Seq[Column] = Nil): DataFrame = {
    val cols = target.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toSeq
    df.select(cols ++ extras: _*)
  }

  private def manifestNode(mapper: ObjectMapper, m: Manifest) = {
    val json = mapper.createObjectNode()
    json.put("version", m.version)
    json.put("operation", m.operation)
    json.put("timestampMs", m.timestampMs)
    val arr = json.putArray("dataDirs")
    m.dataDirs.foreach(arr.add)
    if (m.stats.nonEmpty) {
      val sn = json.putObject("stats")
      m.stats.foreach { case (dir, cols) =>
        val dn = sn.putObject(dir)
        cols.foreach { case (c, st) =>
          val cn = dn.putObject(c)
          cn.put("min", st.min); cn.put("max", st.max); cn.put("kind", st.kind)
        }
      }
    }
    m.schemaJson.foreach(json.put("schema", _))
    if (m.colMap.nonEmpty) {
      val cm = json.putArray("colMap")
      m.colMap.foreach { case (p, l) =>
        val pair = cm.addArray(); pair.add(p); pair.add(l)
      }
    }
    if (m.dvs.nonEmpty) {
      val dv = json.putArray("dvs")
      m.dvs.foreach(dv.add)
    }
    if (m.dirRows.nonEmpty) {
      val rn = json.putObject("rows")
      m.dirRows.foreach { case (d, n) => rn.put(d, n) }
    }
    if (m.dirNulls.nonEmpty) {
      val nn = json.putObject("nullCounts")
      m.dirNulls.foreach { case (d, cols) =>
        val dn = nn.putObject(d)
        cols.foreach { case (c, n) => dn.put(c, n) }
      }
    }
    json
  }

  private def parseManifest(node: JsonNode): Manifest = {
    val stats = Option(node.get("stats")).map { sn =>
      sn.properties().asScala.map { e =>
        e.getKey -> e.getValue.properties().asScala.map { ce =>
          val c = ce.getValue
          ce.getKey -> ColStats(c.get("min").asText(), c.get("max").asText(),
            c.get("kind").asText())
        }.toMap
      }.toMap
    }.getOrElse(Map.empty[String, Map[String, ColStats]])
    Manifest(
      version = node.get("version").asLong(),
      operation = node.get("operation").asText(),
      timestampMs = node.get("timestampMs").asLong(),
      dataDirs = node.get("dataDirs").elements().asScala.map(_.asText()).toSeq,
      stats = stats,
      schemaJson = Option(node.get("schema")).map(_.asText()),
      dvs = Option(node.get("dvs"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
      dirRows = Option(node.get("rows")).map { rn =>
        rn.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
      }.getOrElse(Map.empty),
      dirNulls = Option(node.get("nullCounts")).map { nn =>
        nn.properties().asScala.map { e =>
          e.getKey -> e.getValue.properties().asScala
            .map(ce => ce.getKey -> ce.getValue.asLong()).toMap
        }.toMap
      }.getOrElse(Map.empty),
      colMap = Option(node.get("colMap")).map { cm =>
        cm.elements().asScala.map { pair =>
          val it = pair.elements()
          (it.next().asText(), it.next().asText())
        }.toSeq
      }.getOrElse(Nil))
  }

  /** The stat "kind" of a tracked column — the comparison domain its
    * min/max strings live in. Integral and timestamp values stay EXACT
    * (no double roundtrip: long epoch-nanos lose 256 ns at 1.7e18);
    * strings compare in Spark's UTF8 byte order, not Java UTF-16.
    */
  private[sources] def statKind(dt: DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "int"
      // both timestamp flavors → exact epoch micros (NTZ interpreted in the
      // session zone, which the engine pins to UTC)
      case TimestampType | TimestampNTZType              => "int"
      case FloatType | DoubleType                        => "num"
      case _: DecimalType                                => "dec"
      case _                                             => "str"
    }
  }

  /** Compare two stat strings in the kind's EXACT domain (see
    * `candidateDirs`'s doc for why each kind compares the way it does).
    */
  private[sources] def statCompare(kind: String, a: String, b: String): Int = kind match {
    case "int" => BigInt(a).compare(BigInt(b))
    case "num" => java.lang.Double.compare(a.toDouble, b.toDouble)
    case "dec" => BigDecimal(a).compare(BigDecimal(b))
    case _ =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
  }

  /** Resolve a filter `Column` to a catalyst Expression by analyzing it
    * against a zero-row frame with `schema` — metadata-only, and it
    * validates the predicate's column references before any file is
    * touched. Shared by the flat table's dir pruning and the partitioned
    * table's partition pruning.
    */
  private[sources] def resolveCondition(spark: SparkSession, schema: StructType,
      predicate: Column): Option[org.apache.spark.sql.catalyst.expressions.Expression] = {
    val probe = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    probe.filter(predicate).queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }
  }

  /** Conjunctive (col, lo?, hi?) bounds from a predicate tree; values are
    * rendered into the stat domain ([[statValExpr]]): catalyst timestamp
    * literals are ALREADY epoch micros, strings are UTF8. Literal types
    * with a different internal form than their stat domain (dates = epoch
    * days vs string stats) are skipped rather than risk a domain mismatch
    * — [[dirMayContain]] additionally fails open on any malformed compare.
    */
  /** Boolean-structure-aware pruning test: can something satisfying `e`
    * live where `leafTest` says the per-column bounds CAN overlap? AND
    * intersects, OR unions, NOT and unrecognized leaves are conservative
    * TRUE — so `x < 10 OR x > 90` prunes the middle dirs where a
    * conjunctive-only extractor would prune nothing. `leafTest` receives
    * (column, lo?, hi?) and must fail open on anything it cannot judge.
    * `nullTest` receives (column, wantNull) for IS NULL / IS NOT NULL
    * leaves — on a BARE column reference only: a cast can turn a non-null
    * value into null, so IS NULL through a cast must never prune on the
    * underlying column's zero null count. `neqTest` receives (column,
    * value) for `NOT (col = v)` leaves (after [[pushNotDown]]) and must
    * answer "can this dir hold a row that makes ≠ TRUE" — false only when
    * the dir provably holds nothing but v and nulls (min = max = v).
    */
  private[sources] def mayMatch(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      leafTest: (String, Option[Endpoint], Option[Endpoint]) => Boolean,
      nullTest: (String, Boolean) => Boolean = (_, _) => true,
      neqTest: (String, String) => Boolean = (_, _) => true): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, IsNotNull, IsNull, Not, Or}
    e match {
      case And(l, r) =>
        mayMatch(l, leafTest, nullTest, neqTest) &&
          mayMatch(r, leafTest, nullTest, neqTest)
      case Or(l, r) =>
        mayMatch(l, leafTest, nullTest, neqTest) ||
          mayMatch(r, leafTest, nullTest, neqTest)
      case IsNull(a) =>
        bareAttr(a).forall(nullTest(_, true))
      case IsNotNull(a) =>
        bareAttr(a).forall(nullTest(_, false))
      case Not(eq: EqualTo) => extractBounds(eq) match {
        case Seq((c, Some(lo), Some(hi))) if lo == hi => neqTest(c, lo.v)
        case _ => true
      }
      case leaf => extractBounds(leaf) match {
        case Seq((c, lo, hi)) => leafTest(c, lo, hi)
        case _                => true // no usable bound: never prune
      }
    }
  }

  /** Push NOT down to the leaves for PRUNING purposes (the original
    * predicate still executes on top). De Morgan over AND/OR, double
    * negation elides, and negated comparisons flip to their complements —
    * all exact under SQL three-valued logic for TRUE-satisfiability: a row
    * satisfies `NOT (x > 5)` iff `x > 5` is FALSE, i.e. x non-null and
    * `x <= 5` TRUE, so testing the complement never prunes a matching row
    * (it is a relaxation: it ignores the non-null requirement). `NOT (x =
    * v)` stays put — strict bounds relax to closed in the extractor, so
    * the (< OR >) complement could never prune; [[mayMatch]] instead
    * judges it directly via its not-equal leaf test (a min = max = v dir
    * holds only v and nulls, and neither makes ≠ TRUE). Any other NOT that
    * reaches an unrewritable leaf stays put and [[mayMatch]]'s leaf
    * fallback keeps the dir (never prune on what we can't judge).
    */
  private[sources] def pushNotDown(
      e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    // small literal IN-lists expand to OR-of-equalities in the PRUNING
    // tree: each value prunes separately and OR unions the candidate
    // sets, so x IN (10, 60) drops the dirs between the values where the
    // [min, max] envelope keeps the whole span. Exact for
    // TRUE-satisfiability (IN is TRUE iff some equality is TRUE; null
    // elements make neither side TRUE). Big lists keep the envelope —
    // candidate-set math is per-dir-per-leaf, not worth O(|list|) there.
    def expandIn(in: In): Option[Expression] = in match {
      case In(a, vs) if vs.nonEmpty && vs.size <= 16 && vs.forall(_.foldable) =>
        Some(vs.map(v => EqualTo(a, v): Expression).reduce(Or(_, _)))
      case _ => None
    }
    e match {
      case Not(And(l, r)) => Or(pushNotDown(Not(l)), pushNotDown(Not(r)))
      case Not(Or(l, r))  => And(pushNotDown(Not(l)), pushNotDown(Not(r)))
      case Not(Not(x))    => pushNotDown(x)
      case Not(GreaterThan(a, b))        => LessThanOrEqual(a, b)
      case Not(GreaterThanOrEqual(a, b)) => LessThan(a, b)
      case Not(LessThan(a, b))           => GreaterThanOrEqual(a, b)
      case Not(LessThanOrEqual(a, b))    => GreaterThan(a, b)
      case Not(IsNull(a))    => IsNotNull(a)
      case Not(IsNotNull(a)) => IsNull(a)
      // NOT IN expands then pushes: De Morgan turns it into a conjunction
      // of <> leaves, each of which can prune a constant dir
      case Not(in: In) =>
        expandIn(in).map(x => pushNotDown(Not(x))).getOrElse(e)
      case in: In => expandIn(in).getOrElse(in)
      case And(l, r) => And(pushNotDown(l), pushNotDown(r))
      case Or(l, r)  => Or(pushNotDown(l), pushNotDown(r))
      case other => other
    }
  }

  /** A DIRECT column reference — no cast see-through (see [[mayMatch]]). */
  private def bareAttr(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Option[String] =
    e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(a.name)
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        Some(a.name)
      case _ => None
    }

  private[sources] def extractBounds(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[(String, Option[Endpoint], Option[Endpoint])] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    def attr(x: Expression): Option[String] = x match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        Some(a.name)
      case a: AttributeReference => Some(a.name)
      // type coercion may cast the ATTRIBUTE side (e.g. a TIMESTAMP_NTZ
      // column compared to a TIMESTAMP literal): see through the cast iff
      // it stays inside the column's stat domain, so the rendered bound
      // still compares correctly against the recorded min/max (micros to
      // micros, integral to integral). Cross-domain casts yield no bound.
      case c: Cast => c.child match {
        case a: AttributeReference
          if statKind(a.dataType) == statKind(c.dataType) => Some(a.name)
        case _ => None
      }
      case _ => None
    }
    def litVal(x: Expression): Option[String] = {
      // fold Cast(Literal)-shaped trees the analyzer leaves unfolded (e.g.
      // a string literal compared against a timestamp column); a failing
      // fold (malformed cast) simply contributes no bound
      val folded: Option[Literal] = x match {
        case l: Literal => Some(l)
        case e if e.foldable =>
          try Some(Literal.create(e.eval(null), e.dataType))
          catch { case NonFatal(_) => None }
        case _ => None
      }
      folded.flatMap { l =>
        l.dataType match {
          case ByteType | ShortType | IntegerType | LongType | FloatType |
               DoubleType | StringType | TimestampType | TimestampNTZType |
               _: DecimalType => Option(l.value).map(_.toString)
          case _ => None
        }
      }
    }
    def bound(a: Expression, l: Expression, loSide: Boolean, incl: Boolean) =
      for (c <- attr(a); v <- litVal(l))
        yield if (loSide) (c, Some(Endpoint(v, incl)), None)
          else (c, None, Some(Endpoint(v, incl)))
    // year(col) inversion: `year` is monotone non-decreasing in its
    // argument, so year(c) OP n maps to a range on c itself. The analyzer
    // wraps a timestamp column as Year(Cast(ts AS DATE)) — the cast runs
    // in the session zone (the engine pins UTC), so year boundaries are
    // UTC midnights in the same micros domain the stats record. Rendered
    // as [startOf(n), startOf(n+1)): for dates the ISO strings compare
    // correctly in the str stat domain (4-digit years only — the guard
    // below — since "10000-01-01" would sort before "9999-…").
    // Inversions of TIMESTAMP-typed columns are only sound when the
    // boundary math zone matches the zone the analyzer resolved into the
    // node — we compute UTC boundaries, so require the node's zone BE
    // UTC (None rejects: no guessing). TIMESTAMP_NTZ never inverts: its
    // stat domain (unix_micros of a session-zone cast) moves with the
    // session zone, which a static extractor cannot see. DATE columns
    // are zone-free and always invert.
    def utcZone(tz: Option[String]): Boolean =
      tz.exists { z =>
        try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
        catch { case NonFatal(_) => false }
      }
    def yearTarget(x: Expression): Option[(String, DataType)] = x match {
      case Year(a: AttributeReference) if a.dataType == DateType =>
        Some((a.name, a.dataType))
      case Year(c: Cast) if c.dataType == DateType && utcZone(c.timeZoneId) =>
        c.child match {
          case a: AttributeReference if a.dataType == TimestampType =>
            Some((a.name, a.dataType))
          case _ => None
        }
      case _ => None
    }
    def litInt(x: Expression): Option[Int] = litVal(x).flatMap(v =>
      try Some(v.toInt) catch { case NonFatal(_) => None })
    def startOf(dt: DataType, n: Int): String = dt match {
      case DateType => f"$n%04d-01-01"
      case _ => (java.time.LocalDate.of(n, 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L).toString
    }
    // to_date(ts) inversion: the analyzer renders it as Cast(ts AS DATE),
    // truncation in the session zone (UTC) — so day(ts) OP date-literal
    // maps to the UTC-midnight micros range on ts itself. Date literals
    // are epoch DAYS internally; a day is exactly 86 400 000 000 micros.
    def dayTarget(x: Expression): Option[String] = x match {
      case c: Cast if c.dataType == DateType && utcZone(c.timeZoneId) =>
        c.child match {
          case a: AttributeReference if a.dataType == TimestampType =>
            Some(a.name)
          case _ => None
        }
      case _ => None
    }
    def litDays(x: Expression): Option[Int] = {
      val folded: Option[Literal] = x match {
        case l: Literal => Some(l)
        case e if e.foldable =>
          try Some(Literal.create(e.eval(null), e.dataType))
          catch { case NonFatal(_) => None }
        case _ => None
      }
      folded.collect { case Literal(d: Int, DateType) => d }
    }
    def dayMicros(d: Long): String = (d * 86400000000L).toString
    def dayBounds(c: String, loDay: Option[Long],
                  hiDay: Option[Long]): Seq[(String, Option[Endpoint], Option[Endpoint])] =
      Seq((c, loDay.map(d => Endpoint(dayMicros(d), inclusive = true)),
        hiDay.map(d => Endpoint(dayMicros(d + 1), inclusive = false))))
    def dayCmp(y: Expression, l: Expression, op: String): Seq[(String, Option[Endpoint], Option[Endpoint])] =
      (for (c <- dayTarget(y); d0 <- litDays(l)) yield {
        val d = d0.toLong
        op match {
          case "="  => dayBounds(c, Some(d), Some(d))
          case ">=" => dayBounds(c, Some(d), None)
          case ">"  => dayBounds(c, Some(d + 1), None)
          case "<=" => dayBounds(c, None, Some(d))
          case "<"  => dayBounds(c, None, Some(d - 1))
        }
      }).getOrElse(Nil)
    // date_trunc inversion: trunc is monotone and its image is the
    // aligned boundaries, so trunc(ts) OP X maps to a micros range on ts.
    // floor/next are computed in UTC (the session zone the engine pins);
    // an unaligned X still bounds the inequalities (the nearest aligned
    // boundary does), only '=' needs alignment (unaligned '=' is
    // never TRUE — we conservatively emit no bound rather than a
    // prune-everything marker).
    def truncTarget(x: Expression): Option[(String, String)] = x match {
      case TruncTimestamp(f, a: AttributeReference, tz)
        if a.dataType == TimestampType && utcZone(tz) =>
        (if (f.foldable)
          try Option(f.eval(null)).map(_.toString.toUpperCase)
          catch { case NonFatal(_) => None }
        else None).collect {
          case "YEAR" | "YYYY" | "YY" => (a.name, "year")
          case "QUARTER"              => (a.name, "quarter")
          case "MON" | "MONTH" | "MM" => (a.name, "month")
          case "WEEK"                 => (a.name, "week")
          case "DAY" | "DD"           => (a.name, "day")
          case "HOUR"                 => (a.name, "hour")
          case "MINUTE"               => (a.name, "minute")
          case "SECOND"               => (a.name, "second")
        }
      case _ => None
    }
    def litMicros(x: Expression): Option[Long] = {
      val folded: Option[Literal] = x match {
        case l: Literal => Some(l)
        case e if e.foldable =>
          try Some(Literal.create(e.eval(null), e.dataType))
          catch { case NonFatal(_) => None }
        case _ => None
      }
      folded.collect {
        case Literal(m: Long, TimestampType)    => m
        case Literal(m: Long, TimestampNTZType) => m
      }
    }
    def truncFloor(unit: String, micros: Long): Long = {
      import java.time._
      import java.time.temporal.{ChronoUnit, TemporalAdjusters}
      val ldt = LocalDateTime.ofEpochSecond(Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      val f = unit match {
        case "second"  => ldt.truncatedTo(ChronoUnit.SECONDS)
        case "minute"  => ldt.truncatedTo(ChronoUnit.MINUTES)
        case "hour"    => ldt.truncatedTo(ChronoUnit.HOURS)
        case "day"     => ldt.truncatedTo(ChronoUnit.DAYS)
        case "week"    => ldt.truncatedTo(ChronoUnit.DAYS)
          .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        case "month"   => ldt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
        case "quarter" =>
          val m0 = ldt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
          m0.withMonth(((m0.getMonthValue - 1) / 3) * 3 + 1)
        case _         => ldt.withDayOfYear(1).truncatedTo(ChronoUnit.DAYS)
      }
      f.toEpochSecond(ZoneOffset.UTC) * 1000000L + f.getNano / 1000L
    }
    def truncNext(unit: String, flooredMicros: Long): Long = {
      import java.time._
      val ldt = LocalDateTime.ofEpochSecond(
        Math.floorDiv(flooredMicros, 1000000L),
        (Math.floorMod(flooredMicros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
      val n = unit match {
        case "second"  => ldt.plusSeconds(1)
        case "minute"  => ldt.plusMinutes(1)
        case "hour"    => ldt.plusHours(1)
        case "day"     => ldt.plusDays(1)
        case "week"    => ldt.plusWeeks(1)
        case "month"   => ldt.plusMonths(1)
        case "quarter" => ldt.plusMonths(3)
        case _         => ldt.plusYears(1)
      }
      n.toEpochSecond(ZoneOffset.UTC) * 1000000L + n.getNano / 1000L
    }
    def truncCmp(y: Expression, l: Expression, op: String): Seq[(String, Option[Endpoint], Option[Endpoint])] =
      (for (t <- truncTarget(y); x <- litMicros(l)) yield {
        val (c, unit) = t
        val fl = truncFloor(unit, x)
        val aligned = fl == x
        def ep(m: Long, incl: Boolean) = Endpoint(m.toString, incl)
        op match {
          case "=" if aligned =>
            Seq((c, Some(ep(x, true)), Some(ep(truncNext(unit, x), false))))
          case "=" => Nil // unaligned equality is never TRUE; stay conservative
          case ">=" =>
            val lo = if (aligned) x else truncNext(unit, fl)
            Seq((c, Some(ep(lo, true)), None))
          case ">" => Seq((c, Some(ep(truncNext(unit, fl), true)), None))
          case "<=" => Seq((c, None, Some(ep(truncNext(unit, fl), false))))
          case "<" =>
            val hi = if (aligned) x else truncNext(unit, fl)
            Seq((c, None, Some(ep(hi, false))))
        }
      }).getOrElse(Nil)
    // loYear inclusive-start, hiYear exclusive-start-of-next
    def yearBounds(t: (String, DataType), loYear: Option[Int],
                   hiYear: Option[Int]): Seq[(String, Option[Endpoint], Option[Endpoint])] =
      if (loYear.exists(n => n < 1 || n > 9998) ||
        hiYear.exists(n => n < 0 || n > 9997)) Nil
      else Seq((t._1,
        loYear.map(n => Endpoint(startOf(t._2, n), inclusive = true)),
        hiYear.map(n => Endpoint(startOf(t._2, n + 1), inclusive = false))))
    def yearCmp(y: Expression, l: Expression, op: String): Seq[(String, Option[Endpoint], Option[Endpoint])] =
      (for (t <- yearTarget(y); n <- litInt(l)) yield op match {
        case "="  => yearBounds(t, Some(n), Some(n))
        case ">=" => yearBounds(t, Some(n), None)
        case ">"  => yearBounds(t, Some(n + 1), None)
        case "<=" => yearBounds(t, None, Some(n))
        case "<"  => yearBounds(t, None, Some(n - 1))
      }).getOrElse(Nil)
    // one dispatcher for every invertible monotone wrap
    def invertible(x: Expression): Boolean =
      yearTarget(x).isDefined || dayTarget(x).isDefined ||
        truncTarget(x).isDefined
    def invCmp(y: Expression, l: Expression, op: String): Seq[(String, Option[Endpoint], Option[Endpoint])] =
      if (yearTarget(y).isDefined) yearCmp(y, l, op)
      else if (dayTarget(y).isDefined) dayCmp(y, l, op)
      else truncCmp(y, l, op)
    e match {
      case And(l, r) => extractBounds(l) ++ extractBounds(r)
      // monotone-wrap inversion (year / CAST-to-date / date_trunc), both
      // operand orders; must precede the generic comparison cases, whose
      // attr() would yield nothing and swallow these shapes
      case EqualTo(y, l) if invertible(y) => invCmp(y, l, "=")
      case EqualTo(l, y) if invertible(y) => invCmp(y, l, "=")
      case GreaterThanOrEqual(y, l) if invertible(y) => invCmp(y, l, ">=")
      case GreaterThanOrEqual(l, y) if invertible(y) =>
        invCmp(y, l, "<=") // n >= f(c) ⟺ f(c) <= n
      case GreaterThan(y, l) if invertible(y) => invCmp(y, l, ">")
      case GreaterThan(l, y) if invertible(y) => invCmp(y, l, "<")
      case LessThanOrEqual(y, l) if invertible(y) => invCmp(y, l, "<=")
      case LessThanOrEqual(l, y) if invertible(y) => invCmp(y, l, ">=")
      case LessThan(y, l) if invertible(y) => invCmp(y, l, "<")
      case LessThan(l, y) if invertible(y) => invCmp(y, l, ">")
      // `lit OP attr` flips the side AND keeps the strictness: 49 < x is a
      // strict LOWER bound on x
      case GreaterThanOrEqual(a, l) =>
        bound(a, l, loSide = true, incl = true).toSeq ++
          bound(l, a, loSide = false, incl = true).toSeq
      case GreaterThan(a, l) =>
        bound(a, l, loSide = true, incl = false).toSeq ++
          bound(l, a, loSide = false, incl = false).toSeq
      case LessThanOrEqual(a, l) =>
        bound(a, l, loSide = false, incl = true).toSeq ++
          bound(l, a, loSide = true, incl = true).toSeq
      case LessThan(a, l) =>
        bound(a, l, loSide = false, incl = false).toSeq ++
          bound(l, a, loSide = true, incl = false).toSeq
      case EqualTo(a, l) =>
        (for (c <- attr(a); v <- litVal(l))
          yield (c, Some(Endpoint(v, true)), Some(Endpoint(v, true)))).toSeq ++
          (for (c <- attr(l); v <- litVal(a))
            yield (c, Some(Endpoint(v, true)), Some(Endpoint(v, true)))).toSeq
      // IN-list → [min(values), max(values)] envelope (per-value bloom
      // probes stay readPoint's job; the envelope already kills dirs whose
      // range misses every value)
      case In(a, vs) =>
        try {
          (for {
            c <- attr(a)
            vals <- Some(vs.flatMap(litVal)) if vals.nonEmpty && vals.size == vs.size
            kind = rangeKindOf(a)
            lo <- vals.reduceOption((x, y) => if (statCompare(kind, x, y) <= 0) x else y)
            hi <- vals.reduceOption((x, y) => if (statCompare(kind, x, y) >= 0) x else y)
          } yield (c, Some(Endpoint(lo, true)), Some(Endpoint(hi, true)))).toSeq
        } catch { case NonFatal(_) => Nil } // unparsable values: no bound
      // prefix match → [prefix, nextPrefix) in UTF8-byte order; the upper
      // bound increments the rightmost incrementable code point (all-max
      // prefixes get no upper bound) and is EXCLUSIVE — nextPrefix itself
      // does not carry the prefix.
      case StartsWith(a, l) =>
        (for (c <- attr(a); p <- litVal(l))
          yield (c, Some(Endpoint(p, true)),
            nextUtf8Prefix(p).map(Endpoint(_, false)))).toSeq
      case _ => Nil
    }
  }

  /** The stat kind the bounds of `e` will be compared in — from the
    * resolved attribute when available, else assume "str" (which only
    * affects IN-envelope tightness, never correctness: [[dirMayContain]]
    * fails open on malformed compares).
    */
  private def rangeKindOf(e: org.apache.spark.sql.catalyst.expressions.Expression): String =
    e match {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        statKind(a.dataType)
      case c: org.apache.spark.sql.catalyst.expressions.Cast => rangeKindOf(c.child)
      case _ => "str"
    }

  /** A string strictly greater (in UTF8-byte = code-point order) than every
    * string with prefix `p`: increment p's rightmost incrementable code
    * point and truncate after it (skipping the surrogate gap; code points
    * at U+10FFFF carry left). None when no such bound exists. Working at
    * code-point level keeps the result a VALID string — a byte-level
    * increment could produce invalid UTF-8 whose decode would corrupt the
    * bound's ordering.
    */
  private def nextUtf8Prefix(p: String): Option[String] = {
    val cps = p.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) >= 0x10FFFF) i -= 1
    if (i < 0) None
    else {
      var next = cps(i) + 1
      if (next >= 0xD800 && next <= 0xDFFF) next = 0xE000
      val sb = new java.lang.StringBuilder
      (0 until i).foreach(j => sb.appendCodePoint(cps(j)))
      sb.appendCodePoint(next)
      Some(sb.toString)
    }
  }

  def apply(spark: SparkSession, root: String): VersionedTable =
    new VersionedTable(spark, root)

  def apply(spark: SparkSession, root: String,
            statsCols: Seq[String]): VersionedTable =
    new VersionedTable(spark, root, statsCols)

  def apply(spark: SparkSession, root: String, statsCols: Seq[String],
            constraints: Seq[(String, String)]): VersionedTable =
    new VersionedTable(spark, root, statsCols, constraints = constraints)
}
