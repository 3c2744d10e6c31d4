package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The PARTITIONED governed table's change-data feed as the same virtual
  * `cat.t.changes` spelling flat tables have ([[GraftChangesTable]]) —
  * the sharded layout's day-two need: a user who partitions by repo (the
  * reference's own `{owner}__{repo}` sharding, reference `ingest.py:70-72`)
  * must not lose their change feed.
  *
  * A partitioned table has one transaction log PER PARTITION, so its
  * change feed cannot anchor on member versions — they advance
  * independently. Offsets here are COORDINATOR SNAPSHOT ids (`_snaplog`,
  * [[PartitionedVersionedTable.commitSnapshot]]): every catalog write
  * commits exactly one, and each records the consistent partition→version
  * vector after all its member commits landed. A batch window
  * `[startingVersion, endingVersion]` (snapshot ids) therefore replays,
  * per snapshot transition, the keyed member diffs
  * ([[VersionedTable.changesByKey]]) of exactly the partitions whose
  * recorded version moved — untouched partitions contribute ZERO rows and
  * their logs are never opened — with the partition column present in
  * every diff row (members store it in their data files). `_commit_version`
  * is stamped with the SNAPSHOT id, the only cross-partition-consistent
  * commit domain.
  *
  * Retention is the flat feed's strict contract: a vacuumed snapshot
  * inside the window, or a vacuumed member version a transition needs,
  * fails LOUDLY (mirroring [[GraftChangeBatches.frame]]'s requireLive) —
  * re-emitting or silently collapsing commits would corrupt downstream
  * cursors.
  */
final class GraftPartitionedChangesTable(
    private[sources] val pvt: PartitionedVersionedTable,
    dataSchema: StructType)
    extends Table with SupportsRead {

  override def name(): String = s"graft.`${pvt.tableRoot}#changes`"

  override def schema(): StructType =
    GraftPartitionedChangeBatches.cdfSchema(dataSchema)

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftPartitionedChangesScanBuilder(pvt, schema(), options)
}

final class GraftPartitionedChangesScanBuilder(
    pvt: PartitionedVersionedTable, fullSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    // per-query option wins; else the table's declared default key
    // (`key_cols` TBLPROPERTIES at CREATE) — the pure-SQL spelling
    val keyCols = Option(options.get("keycols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(Some(GraftTableProps.keyCols(SparkSession.active,
        pvt.tableRoot)).filter(_.nonEmpty))
      .getOrElse(throw new IllegalArgumentException(
        "the changes table needs .option(\"keyCols\", \"<entity key>\") — " +
          "the column set the keyed diff matches rows on — or a table-" +
          "level default via TBLPROPERTIES ('key_cols'='...') at CREATE"))
    val startingVersion = Option(options.get("startingversion")).map(_.toLong)
    val endingVersion = Option(options.get("endingversion")).map(_.toLong)
    new GraftPartitionedChangesScan(pvt, keyCols, startingVersion,
      endingVersion, fullSchema, required)
  }
}

/** Both CDF spellings over the sharded layout on one scan object —
  * streaming (snapshot-then-follow, offsets = coordinator snapshot ids,
  * the shared spool machinery of [[GraftCdfMicroBatchStream]]) and batch
  * (`table_changes(startSnapshot, endSnapshot)`; `startingVersion`
  * REQUIRED, same contract as the flat [[GraftChangesScan]]).
  */
final class GraftPartitionedChangesScan(pvt: PartitionedVersionedTable,
                                        keyCols: Seq[String],
                                        startingVersion: Option[Long],
                                        endingVersion: Option[Long],
                                        fullSchema: StructType,
                                        required: StructType)
    extends org.apache.spark.sql.connector.read.V1Scan {

  override def readSchema(): StructType = required

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftCdfMicroBatchStream(
      s"GraftPartitionedCdfMicroBatchStream[${pvt.tableRoot}, " +
        s"keys=${keyCols.mkString(",")}]",
      () => pvt.latestSnapshot, endingVersion,
      (s, e) => GraftPartitionedChangeBatches.frame(pvt, keyCols,
        startingVersion, s, e, fullSchema),
      fullSchema, required, checkpointLocation)

  override def toV1TableScan[T <: org.apache.spark.sql.sources.BaseRelation
      with org.apache.spark.sql.sources.TableScan](
      context: org.apache.spark.sql.SQLContext): T =
    new GraftPartitionedChangesV1Relation(pvt, keyCols, startingVersion,
      endingVersion, fullSchema, required, context).asInstanceOf[T]

  override def description(): String =
    s"GraftPartitionedChangesScan ${pvt.tableRoot} " +
      s"keys=[${keyCols.mkString(",")}]" +
      startingVersion.map(v => s" startingVersion=$v").getOrElse("")
}

private[sources] final class GraftPartitionedChangesV1Relation(
    pvt: PartitionedVersionedTable, keyCols: Seq[String],
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
        ".option(\"startingVersion\", <snapshot id>) — the snapshots whose " +
        "changes to return; use readStream for snapshot-then-follow"))
    val latest = pvt.latestSnapshot.getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot at ${pvt.tableRoot}"))
    val endS = endingVersion.getOrElse(latest)
    // out-of-range windows ERROR, never read as "no changes" — the same
    // cursor-safety contract as the flat table_changes form
    require(sv >= 0 && sv <= latest,
      s"startingVersion $sv out of range [0, $latest] at ${pvt.tableRoot}")
    require(endS >= sv && endS <= latest,
      s"endingVersion $endS out of range [$sv, $latest] at ${pvt.tableRoot}")
    val frame =
      if (sv == 0L)
        GraftPartitionedChangeBatches.frame(pvt, keyCols, Some(0L), None,
          endS, fullSchema)
      else
        GraftPartitionedChangeBatches.frame(pvt, keyCols, None, Some(sv - 1),
          endS, fullSchema)
    frame.select(required.fieldNames.map(n =>
      org.apache.spark.sql.functions.col(s"`$n`")).toSeq: _*).rdd
  }
}

/** The snapshot-anchored CDF batch math — the sharded twin of
  * [[GraftChangeBatches]], and like it the ONE owner of the window rules
  * so the streaming and batch spellings cannot diverge.
  */
private[graft] object GraftPartitionedChangeBatches {

  def cdfSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Keyed CDF rows covering snapshot window `(start, endS]` — or, when
    * `start` is None (stream start), the anchor snapshot as inserts plus
    * follow-up transitions from `startingSnapshot` (default `endS`).
    * Per transition a→b, ONLY partitions whose recorded version moved
    * contribute rows (their member diff), a partition first recorded in
    * b surfaces as inserts, and untouched partitions' logs are never
    * opened. Every snapshot in the window AND every member version a
    * transition needs must survive retention — holes fail loudly.
    */
  def frame(pvt: PartitionedVersionedTable, keyCols: Seq[String],
            startingSnapshot: Option[Long],
            start: Option[Long], endS: Long,
            pinnedSchema: StructType): DataFrame = {
    val snaps = pvt.snapshots
    val live = snaps.toSet
    val outCols = pinnedSchema.fieldNames.toSeq.map(n => col(s"`$n`"))
    // member-log surviving versions, read once per partition per frame
    val memberLive = scala.collection.mutable.Map.empty[String, Set[Long]]
    def liveVersions(p: String): Set[Long] =
      memberLive.getOrElseUpdate(p, pvt.partition(p).versions.toSet)
    def requireLive(from: Long): Unit =
      (from to endS).foreach(s => if (!live.contains(s))
        throw new IllegalStateException(
          s"snapshot $s vacuumed from ${pvt.tableRoot} (surviving: " +
            s"$snaps); cannot replay this change batch exactly — raise " +
            "the vacuum retention above the stream's trigger lag"))
    def snapshotAsInserts(s: Long): DataFrame =
      pvt.readSnapshot(s)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(s))
        .select(outCols: _*)
    def transition(a: Long, b: Long): Seq[DataFrame] = {
      val vecA = pvt.snapshotVersions(a)
      val vecB = pvt.snapshotVersions(b)
      // moved members contribute their PRUNED diff SIDES; the keyed join
      // then runs ONCE per transition over the unioned sides — keys +
      // the partition column (stored in the data files; rows never move
      // between members, so cross-member matching equals per-member) —
      // instead of one full-outer join per moved member. A wide window's
      // plan is O(snapshots) joins, not O(snapshots × moved partitions).
      val sides = vecB.toSeq.sortBy(_._1).flatMap { case (p, vb) =>
        vecA.get(p) match {
          case Some(va) if va == vb => None // untouched: zero rows, log unopened
          case Some(va) =>
            val lv = liveVersions(p)
            if (!lv.contains(va) || !lv.contains(vb))
              throw new IllegalStateException(
                s"member version ${if (lv.contains(va)) vb else va} " +
                  s"vacuumed from ${pvt.tableRoot}/" +
                  s"${pvt.partitionColumn}=$p; cannot replay snapshot " +
                  s"transition $a->$b exactly — raise the vacuum " +
                  "retention above the stream's trigger lag")
            Some(pvt.partition(p).changesByKeySides(va, vb))
          case None => None // born members handled below as plain inserts
        }
      }
      val moved =
        if (sides.isEmpty) None
        else Some(VersionedTable.keyedDiff(
          sides.map(_._1).reduce(_ unionByName _),
          sides.map(_._2).reduce(_ unionByName _),
          // distinct: a composite entity key may already NAME the
          // partition column — duplicating it would make the join
          // reference ambiguous
          (keyCols :+ pvt.partitionColumn).distinct)
          .withColumn("_commit_version", lit(b))
          .select(outCols: _*))
      val born = vecB.toSeq.sortBy(_._1).collect {
        case (p, vb) if !vecA.contains(p) =>
          // partition born in snapshot b: its rows are inserts
          pvt.partition(p).readVersion(vb)
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(b))
            .select(outCols: _*)
      }
      moved.toSeq ++ born
    }
    def diffs(from: Long): Seq[DataFrame] =
      ((from + 1) to endS).flatMap(s => transition(s - 1, s))
    start match {
      case None =>
        val anchor = startingSnapshot.getOrElse(endS)
        requireLive(anchor)
        diffs(anchor).foldLeft(snapshotAsInserts(anchor))(_ unionAll _)
      case Some(sS) =>
        requireLive(sS)
        diffs(sS).reduceOption(_ unionAll _)
          .getOrElse(snapshotAsInserts(endS).limit(0))
    }
  }
}
