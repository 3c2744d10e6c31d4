package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** `spark.readStream.format("graft")` — the governed table as a LIVE
  * structured-streaming source: offsets are COMMIT VERSIONS read straight
  * from the transaction log, so commits that land after the stream starts
  * are picked up at the next trigger (where [[ChangeFeed.streamChanges]]
  * spools a fixed change set at call time, this follows the log forever —
  * the Delta streaming-source discipline).
  *
  * Semantics: the first batch is the anchor snapshot as `insert` rows
  * (snapshot-then-follow; `startingVersion` anchors history instead —
  * inclusive, like [[ChangeFeed.streamChanges]]); every later batch is the
  * keyed diff of the newly committed versions
  * ([[VersionedTable.changesByKey]]: insert / delete / update_preimage /
  * update_postimage), stamped `_commit_version`. `keyCols` (comma-
  * separated) names the entity key the diff is keyed on.
  *
  * Offset math is deterministic from the log, so checkpoint recovery
  * replans the identical batch as long as the versions are not vacuumed —
  * the same retention contract Delta's CDF readers have.
  */
final class GraftChangeSource(spark: SparkSession, vt: VersionedTable,
                              keyCols: Seq[String],
                              startingVersion: Option[Long])
    extends Source {

  override val schema: StructType = GraftChangeBatches.cdfSchema(vt)

  private def ver(o: Offset): Long = o match {
    case l: LongOffset     => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[Offset] =
    vt.latestVersion.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    GraftColumnBridge.streamingFrame(spark, GraftChangeBatches.frame(
      vt, keyCols, startingVersion, start.map(ver), ver(end), schema))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangeSource[${vt.root}, keys=${keyCols.mkString(",")}]"
}

/** The CDF batch math shared by the V1 change source above and the DSv2
  * changes-table stream ([[GraftCdfMicroBatchStream]]): ONE place owns the
  * anchor/follow window rules and the strict retention contract, so the
  * two spellings can never diverge.
  */
private[sources] object GraftChangeBatches {

  /** Data columns + the CDF columns. */
  def cdfSchema(vt: VersionedTable): StructType = {
    val dataSchema = vt.tableSchema.getOrElse(
      throw new IllegalStateException(
        s"no committed schema at ${vt.root}; streaming needs schema tracking"))
    StructType(dataSchema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }

  /** Keyed CDF rows covering `(start, endV]` — or, when `start` is None
    * (stream start), the anchor snapshot as inserts plus follow-up diffs
    * from `startingVersion` (default: `endV`). Every covered version must
    * survive retention: anchoring on an older survivor would re-emit
    * delivered diffs, and a hole inside the window would collapse several
    * commits' deltas under one `_commit_version` — fail loudly instead
    * (the Delta CDF retention contract). `pinnedSchema` is the STREAM's
    * schema, fixed when the stream started — deriving columns from the
    * live table here would crash a running stream the moment an
    * ADD COLUMN commits mid-flight (later versions carry the new column,
    * the declared source schema does not).
    */
  def frame(vt: VersionedTable, keyCols: Seq[String],
            startingVersion: Option[Long],
            start: Option[Long], endV: Long,
            pinnedSchema: StructType): DataFrame = {
    val vs = vt.versions
    val outCols = pinnedSchema.fieldNames.toSeq.map(n => col(s"`$n`"))
    def snapshotAsInserts(v: Long): DataFrame =
      vt.readVersion(v)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v))
        .select(outCols: _*)
    def requireLive(from: Long): Unit = {
      // Set probe, not Seq.contains — this runs per planned batch, and a
      // long-history log would make the linear scan quadratic in the
      // window; versions are sequential so the live set is O(1) amortized
      val live = vs.toSet
      (from to endV).foreach(v => if (!live.contains(v))
        throw new IllegalStateException(
          s"version $v vacuumed from ${vt.root} (surviving: $vs); cannot " +
            "replay this change batch exactly — raise the vacuum " +
            "retention above the stream's trigger lag"))
    }
    def diffs(from: Long): Iterator[DataFrame] =
      (from +: vs.filter(v => v > from && v <= endV)).sliding(2).collect {
        case Seq(a, b) =>
          vt.changesByKey(a, b, keyCols)
            .withColumn("_commit_version", lit(b))
            .select(outCols: _*)
      }
    start match {
      case None =>
        val anchor = startingVersion.getOrElse(endV)
        requireLive(anchor)
        diffs(anchor).foldLeft(snapshotAsInserts(anchor))(_ unionAll _)
      case Some(sV) =>
        requireLive(sV)
        diffs(sV).reduceOption(_ unionAll _)
          .getOrElse(snapshotAsInserts(endV).limit(0))
    }
  }
}
