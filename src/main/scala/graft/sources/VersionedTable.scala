package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Transaction-log-lite versioned table over parquet — the lakehouse-table
  * semantics the reference gets from "read only the newest snapshot"
  * (reference `silver.py:12-17`, `README.md:22`), generalized to real
  * versioned-table behavior: snapshot isolation, time travel, and a
  * transactional MERGE keyed on the entity id.
  *
  * Delta/Iceberg jars are not available in this offline build, so the layer
  * implements the same core protocol directly over the Hadoop FileSystem
  * API (works on local FS and HDFS-compatible stores alike):
  *
  * Layout:
  * {{{
  *   <root>/_txlog/00000000000000000000.json   // manifest for version 0
  *   <root>/_txlog/00000000000000000001.json
  *   <root>/data/c000000000-<uuid>/part-*.parquet
  * }}}
  *
  * Each manifest is the COMPLETE state of one version: the list of data
  * directories that make up the snapshot (copy-on-write; no delete vectors).
  * Commit = write the data first, then create the next manifest with
  * `create(overwrite = false)` — an atomic create-if-absent, so of two
  * concurrent writers exactly one wins version N and the loser gets a
  * [[ConcurrentWriteException]] (optimistic concurrency, same protocol as
  * Delta's log-entry put-if-absent). Readers never see a half-written
  * version: a manifest only becomes visible after its data is fully on
  * disk, and old versions stay readable until [[vacuum]].
  *
  * At 100 TB the copy-on-write MERGE rewrites the table; partition the
  * table (one VersionedTable per partition, e.g. per repo/month) so a MERGE
  * only rewrites partitions containing matched keys — the same discipline
  * Delta users apply with partition-pruned MERGE predicates.
  */
final class VersionedTable(spark: SparkSession, val root: String,
                           statsCols: Seq[String] = Nil) {

  import VersionedTable._

  private val rootPath = new Path(root)
  private val logPath = new Path(rootPath, "_txlog")
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------- log

  /** All committed versions, ascending. */
  def versions: Seq[Long] =
    if (!fs.exists(logPath)) Seq.empty
    else fs.listStatus(logPath).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(n => n.stripSuffix(".json").toLong).toSeq.sorted

  def latestVersion: Option[Long] = versions.lastOption

  private def manifestPath(v: Long): Path =
    new Path(logPath, f"$v%020d.json")

  private def readManifest(v: Long): Manifest = {
    val in = fs.open(manifestPath(v))
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      Iterator.continually(in.read(tmp)).takeWhile(_ >= 0)
        .foreach(n => buf.write(tmp, 0, n))
      buf.toByteArray
    } finally in.close()
    val node = mapper.readTree(bytes)
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
      stats = stats)
  }

  /** Commit a manifest for version `v`: the JSON is fully written to a
    * temp file first, then moved into place with `FileContext.rename`
    * (atomic, fails if the destination exists) — readers can never observe
    * a partial manifest, and of two racing writers exactly one wins.
    * Only the already-exists rename failure is a conflict; any other I/O
    * error propagates as itself (a permissions/disk failure must NOT be
    * reported as a concurrent writer).
    */
  private def commit(m: Manifest): Long = {
    fs.mkdirs(logPath)
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
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json)
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
    m.version
  }

  /** Commit history, newest first (like DESCRIBE HISTORY). */
  def history(): Seq[Manifest] = versions.reverse.map(readManifest)

  // --------------------------------------------------------------- write

  /** The stat "kind" of a tracked column — the comparison domain its
    * min/max strings live in. Integral and timestamp values stay EXACT
    * (no double roundtrip: long epoch-nanos lose 256 ns at 1.7e18);
    * strings compare in Spark's UTF8 byte order, not Java UTF-16.
    */
  private def statKind(dt: org.apache.spark.sql.types.DataType): String = {
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

  /** The column rendered INTO its stat domain (exact per [[statKind]]). */
  private def statValExpr(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast("timestamp"))
      case _ => col(c)
    }

  /** Write one data dir, collecting per-column min/max DURING the write via
    * `observe` — zero extra scan per commit. Returns (dir, stats entry).
    */
  private def writeData(df: DataFrame, version: Long): (String, Map[String, Map[String, ColStats]]) = {
    val dir = f"data/c$version%010d-${java.util.UUID.randomUUID().toString.take(8)}"
    val present = statsCols.filter(df.columns.contains)
    val obs = if (present.isEmpty) None
      else Some(new org.apache.spark.sql.Observation(
        s"vt_stats_${java.util.UUID.randomUUID().toString.take(8)}"))
    val toWrite = obs match {
      case Some(o) =>
        val aggs = count(lit(1)).as("__rows") +: present.flatMap { c =>
          val e = statValExpr(df, c)
          Seq(min(e).as(s"__mn_$c"), max(e).as(s"__mx_$c"))
        }
        df.observe(o, aggs.head, aggs.tail: _*)
      case None => df
    }
    toWrite.write.mode("overwrite").option("compression", "zstd")
      .parquet(new Path(rootPath, dir).toString)
    val stats = obs.map { o =>
      val row = o.get
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
    (dir, stats)
  }

  /** Replace the table contents (CREATE OR REPLACE semantics). */
  def overwrite(df: DataFrame): Long = {
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val (dir, stats) = writeData(df, v)
    commit(Manifest(v, "overwrite", System.currentTimeMillis(), Seq(dir), stats))
  }

  /** Add rows without touching existing files (blind append — no read, no
    * shuffle of existing data; the cheap path for bronze run ingestion).
    * Prior dirs keep their recorded stats (files are immutable).
    */
  def append(df: DataFrame): Long = {
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val prevM = latestVersion.map(readManifest)
    val prev = prevM.map(_.dataDirs).getOrElse(Seq.empty)
    val (dir, stats) = writeData(df, v)
    commit(Manifest(v, "append", System.currentTimeMillis(), prev :+ dir,
      prevM.map(_.stats).getOrElse(Map.empty) ++ stats))
  }

  /** Transactional upsert (MERGE INTO … WHEN MATCHED UPDATE, WHEN NOT
    * MATCHED INSERT): one row per `keyCols` survives, ordered by
    * `orderCol` descending; on an exact `orderCol` tie the UPDATES side
    * wins (matched-update semantics), and remaining ties — duplicate keys
    * WITHIN the updates frame at the same `orderCol` — break on the
    * remaining columns' values, so the winner is fully deterministic
    * (requires orderable column types; pre-collapse the frame yourself if
    * it carries maps).
    *
    * Copy-on-write: reads the current snapshot, resolves winners with ONE
    * window (single shuffle on the key), writes the merged table, commits.
    */
  def merge(updates: DataFrame, keyCols: Seq[String], orderCol: String): Long = {
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    def dedupKeys(df: DataFrame, withSrc: Boolean): DataFrame = {
      val valueTies = df.columns
        .filter(c => !keyCols.contains(c) && c != orderCol && c != "_vt_src")
        .map(col(_).desc).toSeq
      val order = (col(orderCol).desc_nulls_last +:
        (if (withSrc) Seq(col("_vt_src").desc) else Nil)) ++ valueTies
      val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
      df.withColumn("_vt_rn", row_number().over(w))
        .filter(col("_vt_rn") === 1).drop("_vt_rn")
    }
    val merged = latestVersion match {
      case None => dedupKeys(updates, withSrc = false)
      case Some(cur) =>
        val base = readVersion(cur).withColumn("_vt_src", lit(0))
        val upd = updates.select(base.columns.filter(_ != "_vt_src")
          .map(col).toSeq: _*).withColumn("_vt_src", lit(1))
        dedupKeys(base.unionAll(upd), withSrc = true).drop("_vt_src")
    }
    val (dir, stats) = writeData(merged, v)
    commit(Manifest(v, "merge", System.currentTimeMillis(), Seq(dir), stats))
  }

  // ---------------------------------------------------------------- read

  /** Latest snapshot. */
  def read(): DataFrame = readVersion(latestVersion.getOrElse(
    throw new IllegalStateException(s"no committed version at $root")))

  /** Snapshot isolation: the exact file set committed as version `v`,
    * regardless of later commits (time travel by version).
    */
  def readVersion(v: Long): DataFrame = {
    val m = readManifest(v)
    val dirs = m.dataDirs.map(d => new Path(rootPath, d).toString)
    spark.read.parquet(dirs: _*)
  }

  /** Time travel by wall-clock: newest version committed at or before
    * `timestampMs` (TIMESTAMP AS OF semantics).
    */
  def readAsOf(timestampMs: Long): DataFrame = {
    val vs = versions.filter(v => readManifest(v).timestampMs <= timestampMs)
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
    val v = latestVersion.map(_ + 1).getOrElse(
      throw new IllegalStateException(s"nothing to compact at $root"))
    val (dir, stats) = writeData(read(), v)
    commit(Manifest(v, "compact", System.currentTimeMillis(), Seq(dir), stats))
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
    val m = readManifest(v)
    def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    m.dataDirs.filter { d =>
      if (m.stats.get(d).exists(_.contains(rowsMarker))) false // empty dir
      else m.stats.get(d).flatMap(_.get(colName)) match {
        case Some(st) => st.kind match {
          case "int" =>
            val (l, h) = (BigInt(lo.toString), BigInt(hi.toString))
            !(BigInt(st.max) < l || BigInt(st.min) > h)
          case "num" =>
            val (l, h) = (lo.toString.toDouble, hi.toString.toDouble)
            !(st.max.toDouble < l || st.min.toDouble > h)
          case "dec" =>
            val (l, h) = (BigDecimal(lo.toString), BigDecimal(hi.toString))
            !(BigDecimal(st.max) < l || BigDecimal(st.min) > h)
          case _ =>
            !(utf8(st.max).compareTo(utf8(lo.toString)) < 0 ||
              utf8(st.min).compareTo(utf8(hi.toString)) > 0)
        }
        case None => true
      }
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
    val dirs = candidateDirs(v, colName, lo, hi)
    if (dirs.isEmpty) return readVersion(v).limit(0)
    val df = spark.read.parquet(dirs.map(d => new Path(rootPath, d).toString): _*)
    val dt = df.schema(colName).dataType
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
    df.filter(col(colName) >= lb && col(colName) <= hb)
  }

  /** Change data feed between two committed snapshots: rows in `to` but
    * not `from` are inserts, rows in `from` but not `to` are deletes (an
    * update surfaces as a delete+insert pair — row-grain diff, no key
    * knowledge required). Multiset semantics via `exceptAll`, so duplicate
    * rows diff correctly. Cost: one full-row anti-diff each way — the
    * snapshot-store equivalent of Delta's CDF when no change log is kept.
    */
  def changes(from: Long, to: Long): DataFrame = {
    val a = readVersion(from)
    val b = readVersion(to)
    b.exceptAll(a).withColumn("_change_type", lit("insert"))
      .unionAll(a.exceptAll(b).withColumn("_change_type", lit("delete")))
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
    val vs = versions
    val (drop, keep) = vs.splitAt(math.max(0, vs.length - keepVersions))
    val live = keep.flatMap(readManifest(_).dataDirs).toSet
    drop.foreach { v =>
      readManifest(v).dataDirs.filterNot(live)
        .foreach(d => fs.delete(new Path(rootPath, d), true))
      fs.delete(manifestPath(v), false)
    }
    // orphans from losing/crashed writers, past the in-flight window
    val dataRoot = new Path(rootPath, "data")
    if (fs.exists(dataRoot)) {
      val all = versions.flatMap(readManifest(_).dataDirs).toSet
      val cutoff = System.currentTimeMillis() - orphanRetentionMs
      fs.listStatus(dataRoot)
        .filter(st => !all.contains(s"data/${st.getPath.getName}") &&
          st.getModificationTime < cutoff)
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}

object VersionedTable {

  /** One committed version: complete file-set state, not a delta.
    * `stats`: per-dir min/max of the table's tracked columns (the
    * data-skipping index; empty when the table tracks none).
    */
  final case class Manifest(
      version: Long,
      operation: String,
      timestampMs: Long,
      dataDirs: Seq[String],
      stats: Map[String, Map[String, ColStats]] = Map.empty)

  /** Min/max in the comparison domain; kind = "int" | "num" | "dec" |
    * "str" | "rows" (the zero-rows marker under [[rowsMarker]]).
    */
  final case class ColStats(min: String, max: String, kind: String)

  /** Pseudo-column marking a data dir with zero rows (always skippable). */
  val rowsMarker = "__vt_rows"

  final class ConcurrentWriteException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  private val mapper = new ObjectMapper()

  def apply(spark: SparkSession, root: String): VersionedTable =
    new VersionedTable(spark, root)

  def apply(spark: SparkSession, root: String,
            statsCols: Seq[String]): VersionedTable =
    new VersionedTable(spark, root, statsCols)
}
