package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Metadata-only export of a [[VersionedTable]] manifest chain to a
  * `_delta_log`-shaped action log: one NDJSON commit file per version
  * (`_delta_log/%020d.json`) carrying `commitInfo` / `protocol` /
  * `metaData` / `remove` / `add` actions in the open Delta Lake log
  * layout (reference: the published Delta transaction-log protocol —
  * put-if-absent JSON commits, file-grained add/remove with
  * `dataChange`, `metaData` re-emitted on schema change).
  *
  * The export is a pure manifest walk plus per-dir file listings — no
  * data is read or copied; `add` paths point at the table's own parquet
  * part files (root-relative for native dirs, absolute for shallow-clone
  * refs, which is exactly Delta's own absolute-path add convention for
  * cloned files). Dir-grained copy-on-write maps cleanly: a dir carried
  * between versions produces no actions, a dropped dir removes its
  * files, a fresh dir adds them.
  *
  * Out of scope, fails loudly rather than lying: manifests with LIVE
  * deletion vectors (Delta encodes DVs inside `add`, not as plain
  * add/remove — exporting them as full rewrites would misstate history),
  * and vacuumed chains (a removed dir's files must have been listable
  * when it was first added; vacuum erases them).
  */
object DeltaLogExport {

  private val mapper = new ObjectMapper()

  /** Export every committed version of `vt` under `destRoot/_delta_log`.
    * Commit files are numbered 0..n−1 in manifest order (Delta requires a
    * contiguous log); each `commitInfo` carries the original manifest
    * version as `graftVersion`. Returns the written log indices.
    */
  def export(spark: SparkSession, vt: VersionedTable, destRoot: String): Seq[Long] = {
    val versions = vt.versions
    require(versions.nonEmpty, s"no committed version at ${vt.root}")
    val rootPath = new Path(vt.root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val destLog = new Path(new Path(destRoot), "_delta_log")
    fs.mkdirs(destLog)

    // deterministic table id: the export is reproducible, so re-exports
    // of the same table carry the same id (Delta ids are opaque strings)
    val tableId = java.util.UUID.nameUUIDFromBytes(
      vt.root.getBytes("UTF-8")).toString

    def isForeign(d: String): Boolean = d.startsWith("/") || d.contains(":/")

    // (dir → per-file (path, size, mtime)); dirs are immutable once
    // committed, so one listing serves every version that references it
    val fileCache = scala.collection.mutable.Map.empty[String, Seq[(String, Long, Long)]]
    def filesOf(d: String): Seq[(String, Long, Long)] =
      fileCache.getOrElseUpdate(d, {
        val p = if (isForeign(d)) new Path(d) else new Path(rootPath, d)
        if (!fs.exists(p))
          throw new IllegalStateException(
            s"data dir $d is gone (vacuumed?) — cannot export its add/remove actions")
        fs.listStatus(p).filter(_.isFile)
          .filterNot(st => st.getPath.getName.startsWith("_") ||
            st.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map { st =>
            val rel = if (isForeign(d)) st.getPath.toString
              else s"$d/${st.getPath.getName}"
            (rel, st.getLen, st.getModificationTime)
          }.toSeq
      })

    var prevDirs = Set.empty[String]
    var prevSchemaJson: Option[String] = None
    versions.zipWithIndex.map { case (v, idx) =>
      val m = vt.manifestOf(v)
      if (m.dvs.nonEmpty)
        throw new UnsupportedOperationException(
          s"version $v has live deletion vectors; the Delta export only " +
            "covers plain add/remove chains")
      if (m.colMap.nonEmpty)
        throw new UnsupportedOperationException(
          s"version $v uses column mapping; its parquet files carry " +
            "physical column names the exported schemaString would " +
            "misname — unsupported rather than wrong")
      val schemaJson = vt.schemaOf(v).map(_.json)
      val lines = Seq.newBuilder[String]

      val ci = mapper.createObjectNode()
      val cin = ci.putObject("commitInfo")
      cin.put("timestamp", m.timestampMs)
      cin.put("operation", m.operation.toUpperCase)
      cin.put("graftVersion", v)
      lines += mapper.writeValueAsString(ci)

      if (idx == 0) {
        val pr = mapper.createObjectNode()
        val prn = pr.putObject("protocol")
        prn.put("minReaderVersion", 1)
        prn.put("minWriterVersion", 2)
        lines += mapper.writeValueAsString(pr)
      }
      if (idx == 0 || schemaJson != prevSchemaJson) {
        val md = mapper.createObjectNode()
        val mdn = md.putObject("metaData")
        mdn.put("id", tableId)
        val fmt = mdn.putObject("format")
        fmt.put("provider", "parquet")
        fmt.putObject("options")
        mdn.put("schemaString", schemaJson.getOrElse("{}"))
        mdn.putArray("partitionColumns")
        mdn.putObject("configuration")
        mdn.put("createdTime", m.timestampMs)
        lines += mapper.writeValueAsString(md)
      }

      val cur = m.dataDirs.toSet
      for (d <- m.dataDirs.filterNot(prevDirs); (path, size, mtime) <- filesOf(d)) {
        val a = mapper.createObjectNode()
        val an = a.putObject("add")
        an.put("path", path)
        an.putObject("partitionValues")
        an.put("size", size)
        an.put("modificationTime", mtime)
        an.put("dataChange", true)
        lines += mapper.writeValueAsString(a)
      }
      for (d <- prevDirs.toSeq.sorted.filterNot(cur); (path, _, _) <- filesOf(d)) {
        val r = mapper.createObjectNode()
        val rn = r.putObject("remove")
        rn.put("path", path)
        rn.put("deletionTimestamp", m.timestampMs)
        rn.put("dataChange", true)
        lines += mapper.writeValueAsString(r)
      }

      val out = fs.create(new Path(destLog, f"$idx%020d.json"), false)
      try out.write((lines.result().mkString("\n") + "\n").getBytes("UTF-8"))
      finally out.close()
      prevDirs = cur
      prevSchemaJson = schemaJson
      idx.toLong
    }
  }

  /** CONVERT-style import of a `_delta_log` action chain (ours or any
    * producer of the minimal add/remove/metaData subset): replay the
    * commits to the live file set, resolve paths against the Delta table
    * root, and adopt them as a foreign metadata-only snapshot — no data
    * read or copied; the new table reads the ORIGINAL parquet files.
    * Returns the new table handle. Together with [[export]] this closes
    * the interop loop: export → import → read replays byte-equal.
    */
  def importSnapshot(spark: SparkSession, deltaRoot: String,
                     destRoot: String): VersionedTable = {
    val logDir = new Path(new Path(deltaRoot), "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(logDir), s"no _delta_log under $deltaRoot")
    val commits = fs.listStatus(logDir)
      .filter(st => st.getPath.getName.endsWith(".json") &&
        !st.getPath.getName.startsWith("_"))
      .sortBy(_.getPath.getName)
    require(commits.nonEmpty, s"empty _delta_log under $deltaRoot")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    var schemaJson: Option[String] = None
    for (c <- commits) {
      val in = fs.open(c.getPath)
      val text = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
        bos.toString("UTF-8")
      } finally in.close()
      for (line <- text.split('\n') if line.nonEmpty) {
        val node = mapper.readTree(line)
        if (node.has("metaData"))
          schemaJson = Some(node.get("metaData").get("schemaString").asText())
        if (node.has("add")) live += node.get("add").get("path").asText()
        if (node.has("remove")) live -= node.get("remove").get("path").asText()
      }
    }
    require(live.nonEmpty, s"replayed log at $deltaRoot has no live files")
    // Delta convention: add paths are table-root-relative unless absolute
    val resolved = live.toSeq.map { p =>
      val path = new Path(p)
      val abs = if (path.isAbsolute || p.contains(":/")) path
        else new Path(new Path(deltaRoot), p)
      fs.makeQualified(abs).toString
    }
    val dest = VersionedTable(spark, destRoot)
    dest.adoptForeignSnapshot(resolved, schemaJson, "convert_from_delta")
    dest
  }
}
