package graft

import org.apache.spark.sql.functions._

import graft.operators.{Gold, Silver}
import graft.sources.Lakehouse

/** CLI mirroring the reference's verbs (reference `cli.py:14-25`):
  *
  *   silver <bronzeDir> <silverDir>   bronze JSONL (latest run) → issues_silver
  *                                    + label_catalog, parquet + csv
  *   gold   <silverDir> <goldDir>     silver → kpi_monthly_component_tier +
  *                                    kpi_monthly_global, parquet + csv
  *   demo   <goldDir>                 print last 5 months of the global mart
  *
  * `ingest` is driver-side HTTP in the reference (zero-egress here); the
  * engine's ingest surface is "point silver at a directory of pre-fetched
  * JSONL runs" — latest-run resolution included (reference `silver.py:12-17`).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("graft-cli")
    try run(spark, args) finally spark.stop()
  }

  /** The verb dispatch on a CALLER-OWNED session — what tests drive
    * (an in-suite `main` would stop the suite's shared session).
    */
  def run(spark: org.apache.spark.sql.SparkSession,
          args: Array[String]): Unit = {
    args.toList match {
      case "ingest" :: srcJsonl :: bronzeDir :: rest =>
        // zero-egress ingest: src = pre-fetched JSONL (stands in for the
        // GitHub API pagination loop); applies the reference's ingest-time
        // filters (PR exclusion, created_from floor) and stamps a run file
        val createdFrom = rest.headOption.getOrElse("2016-01-01")
        val raw = spark.read.schema(Silver.bronzeSchema).json(srcJsonl)
        // cached: both the write and the logged count consume it — without
        // this the count line re-ran the whole ingest filter (second scan)
        val filtered = Silver.createdFrom(
          Silver.excludePullRequests(raw), createdFrom).cache()
        val runId = java.time.format.DateTimeFormatter
          .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.now())
        val path = Lakehouse.writeJsonlRun(filtered, bronzeDir, runId)
        println(s"[ingest] saved -> $path (${filtered.count()} issues)")
      case "ingest-paged" :: pagesDir :: bronzeDir :: rest =>
        // the reference's cursor-pagination loop against the file-backed
        // page server (reference ingest.py:82-125): since-watermark from
        // prior runs (S5), PR exclusion + created_from floor at ingest time
        val createdFrom = rest.headOption
        val bronze = java.nio.file.Paths.get(bronzeDir)
        java.nio.file.Files.createDirectories(bronze)
        val since = graft.sources.PaginatedIngest.sinceWatermark(bronze)
        since.foreach(s => println(s"[ingest] full_since(updated)=$s"))
        val runId = java.time.format.DateTimeFormatter
          .ofPattern("yyyyMMdd_HHmmss").withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.now())
        val outFile = bronze.resolve(s"issues_$runId.jsonl")
        val client = graft.sources.PaginatedIngest.FilePageClient(pagesDir)
        val stats = graft.sources.PaginatedIngest.ingest(client,
          client.startUrl, since = since, createdFrom = createdFrom,
          outFile = outFile)
        val tag = if (stats.stopped422) " (stopped at 422)" else ""
        println(s"[ingest] saved -> $outFile (${stats.saved} issues, ${stats.pages} pages)$tag")
      case "silver" :: bronzeDir :: silverDir :: rest0 =>
        // default: reference semantics (newest full snapshot wins,
        // silver.py:12-17); "merge": lakehouse MERGE across ALL runs,
        // latest updated_at per issue id. `--rules <file>` swaps the
        // business rules at runtime — the reference's edit-config.yml-and-
        // re-run workflow (config.yml:7-68) without a recompile.
        def flag(args: List[String], name: String): (Option[String], List[String]) =
          args.indexOf(name) match {
            case -1 => (None, args)
            case i if i + 1 < args.length =>
              (Some(args(i + 1)), args.patch(i, Nil, 2))
            case _ => sys.error(s"$name requires a value")
          }
        val (rulesFile, rest1) = flag(rest0, "--rules")
        val (labelsDir, rest) = flag(rest1, "--labels")
        rulesFile.foreach(f => println(s"[silver] rules=$f"))
        labelsDir.foreach(d => println(s"[silver] labels=$d"))
        // .yml/.yaml loads the reference's own config format verbatim;
        // anything else is the engine's flat JSON shape
        val rules = rulesFile.map { f =>
          if (f.endsWith(".yml") || f.endsWith(".yaml"))
            graft.rules.IssueRules.fromYamlFile(f)
          else graft.rules.IssueRules.fromJsonFile(f)
        }.getOrElse(graft.rules.IssueRules.reference)
        val bronze = rest match {
          case "merge" :: Nil =>
            println(s"[silver] bronze=$bronzeDir (merged runs)")
            Lakehouse.mergeRuns(
              spark.read.schema(Silver.bronzeSchema)
                .json(s"$bronzeDir/issues_*.jsonl"))
          case _ =>
            val bronzeFile = Lakehouse.latestRun(spark, bronzeDir)
            println(s"[silver] bronze=$bronzeFile")
            spark.read.schema(Silver.bronzeSchema).json(bronzeFile)
        }
        val silver = Silver.transform(Silver.excludePullRequests(bronze), rules)
        Lakehouse.writeTable(silver, s"$silverDir/issues_silver")
        val catalog = Silver.labelCatalog(
          Silver.excludePullRequests(bronze),
          labelsDir.map(Lakehouse.labelDescriptions(spark, _))
            .getOrElse(Lakehouse.emptyLabelDescriptions(spark)))
        Lakehouse.writeTable(catalog, s"$silverDir/label_catalog")
        val open = silver.filter(col("state") === "open").count()
        val closed = silver.filter(col("state") === "closed").count()
        println(s"[silver] saved -> $silverDir/issues_silver")
        println(s"[silver] stats open=$open closed=$closed")
      case "gold" :: silverDir :: goldDir :: Nil =>
        val silver = Lakehouse.readTable(spark, s"$silverDir/issues_silver")
        val marts = Gold.buildMarts(silver)
        Lakehouse.writeTable(marts.componentTier, s"$goldDir/kpi_monthly_component_tier")
        Lakehouse.writeTable(marts.global, s"$goldDir/kpi_monthly_global")
        val months = marts.global.count()
        println(s"[gold] saved -> $goldDir/kpi_monthly_component_tier")
        println(s"[gold] saved -> $goldDir/kpi_monthly_global")
        println(s"[gold] months=$months")
      case "export" :: goldDir :: destFile :: Nil =>
        // publish the global mart CSV as one named file (reference
        // scripts/export_pages_data.py)
        Lakehouse.exportSingleCsv(spark,
          s"$goldDir/kpi_monthly_global.csv", destFile)
        println(s"[export] saved -> $destFile")
      case "demo" :: goldDir :: Nil =>
        val global = Lakehouse.readTable(spark, s"$goldDir/kpi_monthly_global")
        global.orderBy(desc("month")).limit(5).orderBy("month").show(5, false)
      case "expect" :: path :: rest if rest.nonEmpty =>
        // declarative quality gate over any parquet table: rules are
        // name=<sql predicate>; prints the one-scan audit, and with
        // --quarantine <dir> splits the failing rows (tagged with the
        // rules they failed) out for inspection
        val (qDir, ruleArgs) = rest.span(_ != "--quarantine") match {
          case (rs, "--quarantine" :: dir :: Nil) => (Some(dir), rs)
          case (rs, Nil)                          => (None, rs)
          case _ => sys.error("usage: expect <path> name=pred... [--quarantine <dir>]")
        }
        val rules = ruleArgs.map { a =>
          val (name, pred) = a.span(_ != '=')
          require(pred.startsWith("=") && name.nonEmpty, s"bad rule '$a'")
          graft.operators.Expectations.Rule(name, expr(pred.drop(1)))
        }
        val df = spark.read.parquet(path)
        graft.operators.Expectations.audit(df, rules).show(100, false)
        qDir.foreach { dir =>
          val (_, quarantine) = graft.operators.Expectations.split(df, rules)
          quarantine.write.mode("overwrite").parquet(dir)
          println(s"[expect] quarantine -> $dir")
        }
      case "profile" :: path :: rest =>
        // one-pass data-quality profile of any parquet table; default is
        // the scale mode (HLL++ distinct), pass "exact" for the audit mode
        val exact = rest.contains("exact")
        graft.operators.Profile.profile(
            spark.read.parquet(path), exactDistinct = exact)
          .orderBy("column").show(100, false)
      case "table" :: root :: rest =>
        // versioned-table admin surface (DESCRIBE HISTORY / OPTIMIZE /
        // VACUUM / time-travel SELECT over the tx-log layer)
        val vt = graft.sources.VersionedTable(spark, root)
        rest match {
          case "detail" :: Nil =>
            val d = vt.detail()
            println(s"[table] v${d.version} op=${d.operation} " +
              s"dirs=${d.numDataDirs} rows=${d.numRows.map(_.toString).getOrElse("?(scan needed)")} " +
              s"bytes=${d.sizeBytes} liveDVs=${d.liveDvs} " +
              s"cols=${d.schema.map(_.fields.length).getOrElse(-1)}")
          case "history" :: Nil =>
            vt.history().foreach { m =>
              println(f"[table] v${m.version}%-4d ${m.operation}%-18s " +
                s"dirs=${m.dataDirs.size} ts=${m.timestampMs}")
            }
          case "optimize" :: cols :: tail =>
            val n = tail.headOption.map(_.toInt).getOrElse(16)
            val v = vt.compactClustered(cols.split(",").toSeq, n)
            println(s"[table] optimized -> version $v ($n chunks on $cols)")
          case "pack" :: tail =>
            // bin-packing OPTIMIZE: consolidate only sub-threshold dirs;
            // retrying with the disjoint-file rebase, so an ops-run pack
            // survives racing live writers
            val minRows = tail.headOption.map(_.toLong).getOrElse(100000L)
            vt.compactSmallRetrying(minRows, maxAttempts = 5) match {
              case Some(v) => println(s"[table] packed dirs < $minRows rows -> version $v")
              case None    => println(s"[table] nothing to pack (dirs >= $minRows rows, or < 2 small)")
            }
          case "vacuum" :: "--older-than-ms" :: ms :: Nil =>
            vt.vacuumOlderThan(System.currentTimeMillis() - ms.toLong)
            println(s"[table] vacuumed by age, ${vt.versions.size} versions remain")
          case "vacuum" :: tail =>
            // a malformed --older-than-ms must not fall through to a
            // keep-N vacuum the user didn't ask for
            val keep = tail match {
              case Nil      => 2
              case k :: Nil => k.toIntOption.getOrElse(
                sys.error(s"vacuum takes [keepVersions] or --older-than-ms <ms>; got: $k"))
              case other => sys.error(
                s"vacuum takes [keepVersions] or --older-than-ms <ms>; got: ${other.mkString(" ")}")
            }
            vt.vacuum(keepVersions = keep)
            println(s"[table] vacuumed, kept ${vt.versions.size} versions")
          case "show" :: tail =>
            val df = tail match {
              case v :: Nil => vt.readVersion(v.toLong)
              case Nil      => vt.read()
              case _        => sys.error("table show takes at most a version")
            }
            df.show(10, false)
            println(s"[table] rows=${df.count()} latest=${vt.latestVersion.orNull}")
          case "count" :: Nil =>
            // metadata-only when the ledger allows; falls back to a scan
            vt.metadataCount() match {
              case Some(n) => println(s"[table] rows=$n (metadata-only)")
              case None => println(s"[table] rows=${vt.read().count()} (scanned" +
                "; ledger declined: live DVs or pre-tracking dirs)")
            }
          case "explain" :: predParts if predParts.nonEmpty =>
            // e.g.: table <root> explain "k >= 250 AND s = 'x'"
            val rep = vt.scanReport(
              org.apache.spark.sql.functions.expr(predParts.mkString(" ")))
            rep.show(100, false)
            val n = rep.count()
            val opened = rep.filter("opened").count()
            println(s"[table] scan would open $opened of $n data dirs")
          case "rename-column" :: oldName :: newName :: Nil =>
            val nv = vt.renameColumn(oldName, newName)
            println(s"[table] renamed $oldName -> $newName (metadata-only, version $nv)")
          case "drop-column" :: name :: Nil =>
            val nv = vt.dropColumn(name)
            println(s"[table] dropped $name (metadata-only, version $nv)")
          case "restore" :: v :: Nil =>
            val nv = vt.restore(v.toLong)
            println(s"[table] restored to v$v as version $nv")
          case "clone" :: dest :: Nil =>
            val c = vt.shallowCloneTo(dest)
            println(s"[table] shallow clone -> $dest (rows=${c.read().count()})")
          case "export-delta" :: dest :: Nil =>
            val idx = graft.sources.DeltaLogExport.export(spark, vt, dest)
            println(s"[table] exported ${idx.size} Delta log commits -> $dest/_delta_log")
          case "export-iceberg" :: dest :: Nil =>
            val snaps = graft.sources.IcebergExport.export(spark, vt, dest)
            println(s"[table] exported ${snaps.size} Iceberg snapshots -> $dest/metadata")
          case other =>
            sys.error(s"unknown table verb: ${other.mkString(" ")}")
        }
      case "corpus" :: documentsPath :: outDir :: Nil =>
        // the training-data verb: curate -> split -> pack -> manifest in
        // one run, the same oracled operators the declared queries gate
        // (corpus_clean, corpus_split, corpus_shards,
        // corpus_train_manifest). Outputs: documents_clean.parquet (full
        // surviving rows) + train_manifest.parquet (shard_id,
        // pos_in_shard, doc_id, n_chars).
        val docs = spark.read.parquet(documentsPath)
        val keptIds = graft.operators.CorpusPipeline.clean(docs)
        val kept = docs.join(keptIds.select("doc_id"), Seq("doc_id"))
          .localCheckpoint(true)
        kept.write.mode("overwrite")
          .parquet(s"$outDir/documents_clean.parquet")
        val withSplit = kept.withColumn("split",
          graft.operators.Sampling.assignSplit(col("doc_id"),
            Seq(0.8 -> "train", 0.9 -> "val"), last = "test"))
        val splits = withSplit.groupBy("split").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val packed = graft.operators.Sampling.packShards(
          withSplit.filter(col("split") === "train"),
          idCol = "doc_id", weightCol = "n_chars", nShards = 8)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard_id")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        val manifest = packed.select(col("shard_id"),
          row_number().over(w).cast("long").as("pos_in_shard"),
          col("doc_id"), col("n_chars"))
        manifest.write.mode("overwrite")
          .parquet(s"$outDir/train_manifest.parquet")
        println(s"[corpus] input=${docs.count()} kept=${kept.count()} " +
          s"train=${splits.getOrElse("train", 0L)} " +
          s"val=${splits.getOrElse("val", 0L)} " +
          s"test=${splits.getOrElse("test", 0L)} shards=8 -> $outDir")
        graft.operators.CorpusPipeline.filterFunnel(docs)
          .orderBy("stage").collect().foreach { r =>
            println(f"[corpus]   ${r.getString(1)}%-9s " +
              f"docs=${r.getLong(2)}%-6d tokens=${r.getLong(3)}")
          }
      case "dedup-index" :: "build" :: documentsPath :: indexRoot :: rest =>
        // nightly index build: shingle the corpus ONCE into a postings
        // table (the X291 shape — the screen never reshingles the base),
        // BUCKETED on the screen-join key `sg` (X370): the postings frame
        // is corpus-scale, and the bucketed layout lets every daily
        // screen's df aggregate AND equi-join plan with no exchange on
        // the index side — only the day's batch shuffles
        val nBuckets = rest match {
          case "--buckets" :: n :: Nil => n.toInt
          case Nil => 32
          case other => sys.error(s"unknown build args: ${other.mkString(" ")}")
        }
        val docs = spark.read.parquet(documentsPath)
        val vt = graft.sources.VersionedTable(spark, indexRoot)
        val v = vt.overwriteBucketed(
          graft.operators.Dedup.postings(docs, n = 3),
          nBuckets, bucketCols = Seq("sg"), sortCols = Seq("sg"))
        println(s"[dedup-index] built v$v: ${vt.read().count()} postings " +
          s"($nBuckets buckets) from ${docs.count()} docs -> $indexRoot")

      case "dedup-index" :: "compact" :: indexRoot :: rest =>
        // layout maintenance for the append-mode postings: rewrite the
        // accumulated frames into one bucketed dir (postings are facts —
        // unlike the substr count index there is nothing to key-merge, so
        // this is a multiset-preserving rewrite; additivity of the df
        // counts keeps every screen bit-identical)
        val nBuckets = rest match {
          case "--buckets" :: n :: Nil => n.toInt
          case Nil => 32
          case other => sys.error(s"unknown compact args: ${other.mkString(" ")}")
        }
        val vt = graft.sources.VersionedTable(spark, indexRoot)
        val head = vt.latestVersion
          .getOrElse(sys.error(s"no committed index at $indexRoot"))
        val before = vt.manifestOf(head).dataDirs.size
        // rebucket = read-head + CAS commit: a concurrent screen --append
        // fails this rewrite loudly, never gets silently erased by it
        val v = vt.rebucket(nBuckets, bucketCols = Seq("sg"),
          sortCols = Seq("sg"), at = Some(head))
        println(s"[dedup-index] compacted $before frames -> 1 bucketed dir " +
          s"($nBuckets buckets) as v$v")

      case "dedup-index" :: "screen" :: batchPath :: indexRoot :: rest =>
        // daily screen: batch × stored postings (bit-identical to the
        // from-scratch join — dedup_index_screen's differential gate);
        // --append then advances the index by one pure-append commit.
        // The bucketed read means a build/compact-written index
        // contributes no shuffle to the screen's joins; append-mode
        // frames fall back to the plain scan until the next compact
        val doAppend = rest match {
          case "--append" :: Nil => true
          case Nil => false
          case other => sys.error(s"unknown screen args: ${other.mkString(" ")}")
        }
        val batch = spark.read.parquet(batchPath)
        val vt = graft.sources.VersionedTable(spark, indexRoot)
        val posts = graft.operators.Dedup.postings(batch, n = 3)
          .localCheckpoint(true)
        val hits = graft.operators.Dedup.crossJaccardFromPostings(
          posts, vt.readBucketed(), minJaccard = 0.5).localCheckpoint(true)
        val n = hits.count()
        println(s"[dedup-index] screened ${batch.count()} docs: " +
          s"$n near-dup pairs vs index v${vt.latestVersion.getOrElse(-1L)}")
        hits.orderBy(col("jaccard").desc, col("new_id")).limit(10)
          .collect().foreach { r =>
            println(f"[dedup-index]   new=${r.getLong(0)}%-8d " +
              f"base=${r.getLong(1)}%-8d jaccard=${r.getDouble(2)}%.4f")
          }
        if (doAppend) {
          val v = vt.append(posts)
          println(s"[dedup-index] appended batch postings as v$v")
        }

      case "substr-index" :: "build" :: documentsPath :: root :: rest =>
        // ExactSubstr nightly build AS A MANIFEST: the corpus table and
        // its window-count index land under ONE MultiTableTxn stamp, so
        // every later screen reads a corpus/index pair that is
        // guaranteed in step (a corpus one batch ahead of its index
        // silently under-screens). --window persists in a root marker —
        // the screen's keys must be built at the SAME window or they
        // never match (the index schema carries the same stamp as a
        // library-level guard). The index lands BUCKETED on the screen's
        // join keys (h1, h2): the index is corpus-scale at 100 TB, and
        // the bucketed layout is what lets every daily screen plan with
        // no exchange above the index scan — write once, join forever.
        def parseBuild(args: List[String], acc: (Int, Int)): (Int, Int) =
          args match {
            case Nil => acc
            case "--window" :: n :: tail => parseBuild(tail, (n.toInt, acc._2))
            case "--buckets" :: n :: tail => parseBuild(tail, (acc._1, n.toInt))
            case other => sys.error(s"unknown build args: ${other.mkString(" ")}")
          }
        val (w, nBuckets) = parseBuild(rest, (50, 32)) // Lee et al.'s window
        require(w >= 2, "--window must be >= 2")
        require(nBuckets >= 1, "--buckets must be >= 1")
        val docs = spark.read.parquet(documentsPath)
        val corpus = graft.sources.VersionedTable(spark, s"$root/corpus")
        val index = graft.sources.VersionedTable(spark, s"$root/index")
        val txn = graft.sources.MultiTableTxn(spark, root)
        val vc = corpus.overwrite(docs)
        val vi = index.overwriteBucketed(
          graft.operators.Dedup.exactSubstrIndex(docs, windowTokens = w),
          nBuckets, bucketCols = Seq("h1", "h2"), sortCols = Seq("h1", "h2"))
        val t = txn.commitRetrying("substr_bootstrap",
          Seq(("corpus", corpus, vc), ("index", index, vi)))
        val fsS = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val out = fsS.create(
          new org.apache.hadoop.fs.Path(root, "_substr.json"), true)
        try out.write(s"""{"windowTokens": $w}""".getBytes("UTF-8"))
        finally out.close()
        println(s"[substr-index] txn $t: corpus v$vc (${docs.count()} docs), " +
          s"index v$vi (${index.read().count()} window keys, w=$w, " +
          s"$nBuckets buckets) -> $root")

      case "substr-index" :: "screen" :: batchPath :: root :: rest =>
        // daily screen: the batch's duplicated spans vs base+batch, read
        // from the LAST STAMPED transaction (never a half-staged pair);
        // --append then stages corpus+index appends and stamps the next
        // transaction — the atomic daily_load the manifest exists for.
        // --redact (with --append) CUTS the flagged spans before loading:
        // the appended corpus rows carry the redacted text, and the
        // appended index counts are computed ON THE REDACTED TEXT — the
        // index must describe what the corpus actually holds, or the next
        // day's screen would flag against tokens that were already cut.
        def parseScreen(args: List[String],
                        acc: (Boolean, Boolean)): (Boolean, Boolean) =
          args match {
            case Nil => acc
            case "--append" :: tail => parseScreen(tail, (true, acc._2))
            case "--redact" :: tail => parseScreen(tail, (acc._1, true))
            case other => sys.error(s"unknown screen args: ${other.mkString(" ")}")
          }
        val (doAppend, doRedact) = parseScreen(rest, (false, false))
        require(!doRedact || doAppend,
          "--redact only makes sense with --append (redaction rewrites " +
            "the batch that is being loaded)")
        val fsS = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val marker = new org.apache.hadoop.fs.Path(root, "_substr.json")
        require(fsS.exists(marker),
          s"no _substr.json at $root — run substr-index build first")
        val in = fsS.open(marker)
        val w = try new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(in.readAllBytes()).get("windowTokens").asInt()
        finally in.close()
        val txn = graft.sources.MultiTableTxn(spark, root)
        val t0 = txn.latest.getOrElse(
          sys.error(s"no stamped transaction at $root"))
        val batch = spark.read.parquet(batchPath)
        val index = graft.sources.VersionedTable(spark, s"$root/index")
        val pinIdx = txn.vector(t0)("index")._2
        // bucketed read: a build/compact-written index scans with its
        // hash partitioning visible, so this join adds no exchange above
        // the index side (only the day's batch shuffles); an append-mode
        // index falls back to the plain scan — same rows, one more
        // exchange, which is exactly what `substr-index compact` deletes
        val spans = graft.operators.Dedup.exactSubstrSpansIncremental(
          batch, index.readVersionBucketed(pinIdx), windowTokens = w)
          .localCheckpoint(true)
        val nSpans = spans.count()
        val nDocs = spans.select("doc_id").distinct().count()
        println(s"[substr-index] screened ${batch.count()} docs vs txn $t0 " +
          s"(w=$w): $nSpans duplicated spans in $nDocs docs")
        spans.orderBy(col("span_tokens").desc, col("doc_id")).limit(10)
          .collect().foreach { r =>
            // doc_id is whatever type the batch parquet carries (long in
            // the synthetic tables, int/string in the wild) — format the
            // raw value instead of assuming LongType after the whole
            // screen job already ran
            println(f"[substr-index]   doc=${String.valueOf(r.get(0))}%-8s " +
              f"[${r.getLong(1)}%d, ${r.getLong(2)}%d) " +
              f"${r.getLong(3)}%d tokens")
          }
        if (doAppend) {
          val corpus = graft.sources.VersionedTable(spark, s"$root/corpus")
          val (toLoad, op) =
            if (!doRedact) (batch, "substr_daily_load")
            else {
              val red = graft.operators.Dedup.redactSpans(batch, spans)
                .localCheckpoint(true)
              val c = red.agg(sum("n_tokens"), sum("kept_tokens"),
                sum("removed_tokens")).head()
              val (nt, kt, rt) = (c.getLong(0), c.getLong(1), c.getLong(2))
              require(kt + rt == nt,
                s"redaction must conserve tokens: kept $kt + removed $rt != $nt")
              println(s"[substr-index] redacted: $rt of $nt tokens cut " +
                f"(${100.0 * rt / math.max(nt, 1L)}%.2f%%), $kt kept")
              // docs with NO flagged span keep their ORIGINAL text —
              // text_redacted is a token re-join (single-space), and
              // rewriting an untouched doc's whitespace would corrupt
              // training data the screen never flagged
              (batch.join(
                red.select(col("doc_id"), col("text_redacted"),
                  col("removed_tokens")),
                Seq("doc_id"))
                .withColumn("text",
                  when(col("removed_tokens") > 0, col("text_redacted"))
                    .otherwise(col("text")))
                .drop("text_redacted", "removed_tokens"),
                "substr_daily_load_redacted")
            }
          val vc = corpus.append(toLoad.select(
            corpus.read().columns.map(col).toSeq: _*))
          val vi = index.append(graft.operators.Dedup.exactSubstrIndex(
            toLoad, windowTokens = w))
          val t1 = txn.commitRetrying(op,
            Seq(("corpus", corpus, vc), ("index", index, vi)))
          println(s"[substr-index] stamped txn $t1: corpus v$vc + index v$vi")
        }

      case "substr-index" :: "compact" :: root :: rest =>
        // key-merging index maintenance: re-aggregate every appended
        // (h1, h2, cnt) frame into ONE sum-merged frame in the bucketed
        // layout and stamp it — screens stay O(distinct windows) instead
        // of O(Σ appended frames), and the index side of every later
        // screen plans exchange-free. Additivity makes this invisible to
        // screen results; the stamp keeps consistent readers consistent.
        val nBuckets = rest match {
          case "--buckets" :: n :: Nil => n.toInt
          case Nil => 32
          case other => sys.error(s"unknown compact args: ${other.mkString(" ")}")
        }
        val txn = graft.sources.MultiTableTxn(spark, root)
        val t0 = txn.latest.getOrElse(
          sys.error(s"no stamped transaction at $root"))
        val index = graft.sources.VersionedTable(spark, s"$root/index")
        val pinIdx = txn.vector(t0)("index")._2
        // compaction folds the CURRENT index — refuse if a crashed screen
        // left a staged-but-unstamped append, which stamping the compacted
        // frame would silently expose (all-or-nothing must hold)
        require(index.latestVersion.contains(pinIdx),
          s"index latest ${index.latestVersion} != stamped pin $pinIdx — " +
            "a staged-but-unstamped commit exists; stamp or vacuum it first")
        val nFramesBefore = index.manifestOf(pinIdx).dataDirs.size
        // anchor the fold on the VALIDATED pin (not a head re-read): a
        // staged-but-unstamped append landing after the check above must
        // fail the CAS, never get folded and stamped
        val vi = graft.operators.Dedup.compactSubstrIndex(index, nBuckets,
          at = Some(pinIdx))
        val t1 = txn.commitAtRetrying("substr_compact",
          Seq(("index", s"$root/index", vi)))
        println(s"[substr-index] compacted $nFramesBefore frames -> 1 " +
          s"bucketed dir ($nBuckets buckets), index v$vi, txn $t1")

      // ---- the transaction-manifest verb family: the ops surface of
      // the training-run story (history → fork → diverge → diff →
      // materialize), mirroring the SQL CALL procedures for pipelines
      // driven from a shell instead of a SQL session
      case "txn" :: "history" :: log :: Nil =>
        val txn = graft.sources.MultiTableTxn(spark, log)
        val ids = txn.txns
        if (ids.isEmpty) println(s"[txn] no stamped transactions at $log")
        ids.foreach { id =>
          val (op, ts, vec) = txn.stampDetail(id) // one read per stamp
          println(f"[txn] $id%6d  $op%-28s ${new java.sql.Timestamp(ts)}  " +
            s"${vec.size} tables")
        }

      case "txn" :: "fork" :: log :: txnId :: destLog :: Nil =>
        // reproduce the exact dataset lineup transaction txnId pinned,
        // under a fresh log — metadata only (manifests referencing source
        // files in place + one stamp); see `txn materialize` for making
        // the fork survive source vacuums
        val fork = graft.sources.MultiTableTxn(spark, log)
          .cloneAt(txnId.toLong, destLog)
        fork.vector(0L).toSeq.sortBy(_._1).foreach { case (n, (r, v)) =>
          println(s"[txn]   $n -> $r @ $v")
        }
        println(s"[txn] forked $log@$txnId -> $destLog (txn 0)")

      case "txn" :: "materialize" :: log :: txnId :: Nil =>
        val t = graft.sources.MultiTableTxn(spark, log)
          .materialize(txnId.toLong)
        println(s"[txn] materialized $log@$txnId: every member self-owned, " +
          s"stamped txn $t")

      case "txn" :: "rebase" :: forkLog :: srcLog :: keyCols :: rest =>
        // pull the source's delta since the last sync stamp onto the
        // fork; keyCols applies to every member (the SQL procedure's
        // per-table spelling covers mixed keys)
        val policy = rest match {
          case "--policy" :: p :: Nil => p
          case Nil => "fail"
          case other => sys.error(s"unknown rebase args: ${other.mkString(" ")}")
        }
        val ks = keyCols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val t = graft.sources.MultiTableTxn(spark, forkLog)
          .rebase(graft.sources.MultiTableTxn(spark, srcLog), _ => ks, policy)
        println(s"[txn] rebased $forkLog onto $srcLog (policy=$policy): " +
          s"stamped txn $t")

      case "txn" :: "diff" :: logA :: txnA :: logB :: txnB :: table ::
          keys :: Nil =>
        // "what did the experiment change?" — per-class row counts of the
        // keyed diff between two pinned states (full frame available via
        // the library/SQL surface; the CLI prints the release-note line)
        val diff = graft.sources.MultiTableTxn(spark, logA)
          .diffAt(txnA.toLong, table,
            graft.sources.MultiTableTxn(spark, logB), txnB.toLong,
            keys.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        val byClass = diff.groupBy("_change_type").count()
          .orderBy("_change_type").collect()
        if (byClass.isEmpty) println(s"[txn] states are identical")
        byClass.foreach(r =>
          println(f"[txn]   ${r.getString(0)}%-18s ${r.getLong(1)}%d rows"))

      case "audit" :: documentsPath :: outDir :: rest =>
        // dataset audit card: the release-note numbers a curation run
        // reports before anything trains on the data — PII findings
        // (validated, not just shape matches), Unicode-script mix,
        // exact-dup pressure, and (with --blocklist <file>, one term per
        // line, multi-word lines matched as phrases) the C4-style
        // banned-term screen. Same oracled operators the declared
        // queries gate (text_pii_stats, text_script_mix,
        // dedup_exact_groups, corpus_blocklist).
        def parseAuditArgs(args: List[String],
                           acc: (Option[String], Int)): (Option[String], Int) =
          args match {
            case Nil => acc
            case "--blocklist" :: f :: tail =>
              parseAuditArgs(tail, (Some(f), acc._2))
            case "--substr-window" :: n :: tail if n.matches("[0-9]+") =>
              parseAuditArgs(tail, (acc._1, n.toInt))
            case other => sys.error(s"unknown audit args: ${other.mkString(" ")}")
          }
        // 50 = Lee et al. 2022's production window; the synthetic test
        // corpus needs a smaller one (--substr-window 15) to show signal
        val (blistFile, substrW) = parseAuditArgs(rest, (None, 50))
        val docs = spark.read.parquet(documentsPath)
        val nDocs = docs.count()

        val pii = graft.operators.Pii.piiStats(docs, "text", "source")
          .localCheckpoint(true)
        pii.write.mode("overwrite").parquet(s"$outDir/pii_audit.parquet")
        val p = pii.agg(sum("n_emails"), sum("n_ipv4_valid"), sum("n_ipv4"),
          sum("n_cards_luhn"), sum("n_cards"), sum("n_ssn"),
          sum("docs_with_pii")).collect()(0)
        println(s"[audit] docs=$nDocs")
        println(s"[audit] pii: emails=${p.getLong(0)} " +
          s"ipv4=${p.getLong(1)}/${p.getLong(2)} valid " +
          s"cards=${p.getLong(3)}/${p.getLong(4)} luhn " +
          s"ssn=${p.getLong(5)} docs_with_pii=${p.getLong(6)}")

        val scripts = graft.operators.ScriptMix.mix(docs, "text", "lang")
          .localCheckpoint(true)
        scripts.write.mode("overwrite")
          .parquet(s"$outDir/script_audit.parquet")
        val sc = scripts.agg(sum("n_latin"), sum("n_cjk"), sum("n_cyrillic"),
          sum("n_digit"), sum("n_other"), sum("n_space")).collect()(0)
        val nonSpace = (0 to 4).map(sc.getLong).sum.toDouble.max(1.0)
        println(f"[audit] scripts: latin=${sc.getLong(0) / nonSpace}%.4f " +
          f"cjk=${sc.getLong(1) / nonSpace}%.4f " +
          f"cyrillic=${sc.getLong(2) / nonSpace}%.4f " +
          f"digit=${sc.getLong(3) / nonSpace}%.4f " +
          f"other=${sc.getLong(4) / nonSpace}%.4f of non-space chars")

        val dups = graft.operators.Dedup.exactGroups(docs)
          .filter(col("n") > 1).agg(
            coalesce(count(lit(1)), lit(0L)).as("groups"),
            coalesce(sum(col("n") - 1), lit(0L)).as("extra"))
          .collect()(0)
        println(f"[audit] exact-dup: groups=${dups.getLong(0)} " +
          f"redundant_docs=${dups.getLong(1)} " +
          f"(${dups.getLong(1).toDouble / nDocs}%.4f of corpus)")

        // ExactSubstr pressure: how much of the corpus is VERBATIM
        // duplicated spans (Lee et al. 2022) — the doc-grain dedup above
        // cannot see a license block pasted into otherwise-unique docs
        val substr = graft.operators.Dedup
          .exactSubstrStats(docs, windowTokens = substrW)
          .localCheckpoint(true)
        substr.write.mode("overwrite")
          .parquet(s"$outDir/substr_audit.parquet")
        val ss = substr.agg(sum("dup_tokens"), sum("n_tokens"),
          count(when(col("n_spans") > 0, 1))).collect()(0)
        println(f"[audit] exact-substr(w=$substrW): " +
          f"dup_tokens=${ss.getLong(0)} " +
          f"(${ss.getLong(0).toDouble / math.max(ss.getLong(1), 1L)}%.4f " +
          f"of tokens) docs_with_spans=${ss.getLong(2)}")

        blistFile.foreach { f =>
          val terms = scala.util.Using.resource(scala.io.Source.fromFile(f))(
            _.getLines().map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
          val (words, phrases) = terms.partition(!_.contains(" "))
          val bl = graft.operators.Blocklist.screen(
            docs, "text", "source", words, phrases).localCheckpoint(true)
          bl.write.mode("overwrite")
            .parquet(s"$outDir/blocklist_audit.parquet")
          val b = bl.agg(sum("n_flagged"), sum("word_hits"),
            sum("phrase_hits")).collect()(0)
          println(f"[audit] blocklist(${words.size} words, " +
            f"${phrases.size} phrases): flagged=${b.getLong(0)} " +
            f"(${b.getLong(0).toDouble / nDocs}%.4f) " +
            f"word_hits=${b.getLong(1)} phrase_hits=${b.getLong(2)}")
        }
        println(s"[audit] wrote ${if (blistFile.isDefined) 4 else 3} " +
          s"audit tables -> $outDir")

      case "tokenizer" :: documentsPath :: outDir :: Nil =>
        // tokenizer-construction verb: train all THREE tokenizer families
        // on the corpus (the same oracled operators text_bpe_train /
        // text_unigram_train / text_wordpiece_train gate), persist the
        // artifacts, and print the per-language fertility bake-off
        val docs = spark.read.parquet(documentsPath)
        val merges = graft.operators.Bpe.trainOnCorpus(docs, "text", k = 12)
          .localCheckpoint(true)
        merges.write.mode("overwrite")
          .parquet(s"$outDir/bpe_merges.parquet")
        val vocabDf = graft.operators.Unigram.train(docs, "text")
          .localCheckpoint(true)
        vocabDf.write.mode("overwrite")
          .parquet(s"$outDir/unigram_vocab.parquet")
        val wpDf = graft.operators.Wordpiece.trainOnCorpus(docs, "text", k = 10)
          .localCheckpoint(true)
        wpDf.write.mode("overwrite")
          .parquet(s"$outDir/wordpiece_pieces.parquet")
        val mergeList = merges.orderBy("rank").collect()
          .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
        val vocab = vocabDf.collect()
          .map(r => (r.getString(0), r.getLong(2))).toSeq
        // `merged` already carries the left symbol's ## prefix (a merge of
        // ##a + ##b emits ##ab) — it IS the vocab piece, verbatim
        val wpPieces = wpDf.orderBy("rank").collect()
          .map(_.getAs[String]("merged")).toSeq
        println(s"[tokenizer] bpe_merges=${mergeList.size} " +
          s"unigram_vocab=${vocab.size} wordpiece_pieces=${wpPieces.size} " +
          s"-> $outDir")
        val wpFert = graft.operators.Wordpiece.fertilityByGroup(
            docs, "text", "lang", wpPieces)
          .select(col("lang"), col("fertility").as("wp_fert"))
        graft.operators.Unigram.compareFertility(
            docs, "text", "lang", mergeList, vocab)
          .join(wpFert, Seq("lang"))
          .orderBy("lang").collect().foreach { r =>
            println(f"[tokenizer]   lang=${r.getString(0)}%-4s " +
              f"bpe=${r.getDouble(4)}%.4f unigram=${r.getDouble(5)}%.4f " +
              f"wordpiece=${r.getAs[Double]("wp_fert")}%.4f chars/unit")
          }

      case "checkpoint-clean" :: dir :: olderThanMs :: Nil
          if olderThanMs.matches("[0-9]+") =>
        // retention sweep for the reliable shared-pass checkpoint volume
        // (Spark never deletes reliable checkpoint data on its own unless
        // the GC-driven cleanCheckpoints cleaner is enabled)
        val n = graft.operators.SharedPass.cleanup(
          spark, olderThanMs.toLong, rootOverride = Some(dir))
        println(s"[checkpoint-clean] removed $n stale checkpointed " +
          s"frame(s) under $dir (older than ${olderThanMs}ms)")

      case other =>
        System.err.println(
          "usage: ingest <srcJsonl> <bronzeDir> [createdFrom] | " +
            "silver <bronzeDir> <outDir> [merge] [--rules <file>] [--labels <pagesDir>] | " +
            "gold <silverDir> <outDir> | export <goldDir> <destFile> | " +
            "demo <goldDir> | profile <parquet> [exact] | " +
            "expect <parquet> name=pred... [--quarantine <dir>] | " +
            "table <root> detail|history|optimize <cols> [n]|pack [minRows]|" +
            "vacuum [keep]|vacuum --older-than-ms <ms>|show [version]|" +
            "count|restore <version>|clone <dest>|" +
            "export-delta <dest>|export-iceberg <dest> | " +
            "corpus <documentsParquet> <outDir> | " +
            "tokenizer <documentsParquet> <outDir> | " +
            "audit <documentsParquet> <outDir> [--blocklist <file>] " +
            "[--substr-window <n>] | " +
            "dedup-index build <documentsParquet> <indexRoot> [--buckets <n>] | " +
            "dedup-index screen <batchParquet> <indexRoot> [--append] | " +
            "dedup-index compact <indexRoot> [--buckets <n>] | " +
            "substr-index build <documentsParquet> <root> [--window <n>] [--buckets <n>] | " +
            "substr-index screen <batchParquet> <root> [--append] [--redact] | " +
            "substr-index compact <root> [--buckets <n>] | " +
            "txn history <log> | txn fork <log> <txn> <destLog> | " +
            "txn materialize <log> <txn> | " +
            "txn rebase <forkLog> <srcLog> <keyCols> [--policy p] | " +
            "txn diff <logA> <txnA> <logB> <txnB> <table> <keyCols> | " +
            "checkpoint-clean <dir> <olderThanMs>; " +
            s"got: ${other.mkString(" ")}")
        sys.exit(2)
    }
  }
}
