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

  private val dataSchema: StructType = vt.tableSchema.getOrElse(
    throw new IllegalStateException(
      s"no committed schema at ${vt.root}; streaming needs schema tracking"))

  override val schema: StructType = StructType(dataSchema.fields ++ Seq(
    StructField("_change_type", StringType, nullable = false),
    StructField("_commit_version", LongType, nullable = false)))

  private def ver(o: Offset): Long = o match {
    case l: LongOffset     => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[Offset] =
    vt.latestVersion.map(LongOffset(_))

  private def outCols = schema.fieldNames.toSeq.map(n => col(s"`$n`"))

  private def snapshotAsInserts(v: Long): DataFrame =
    vt.readVersion(v)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(v))
      .select(outCols: _*)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    val vs = vt.versions
    val batch = start match {
      case None =>
        // stream start: anchor snapshot (plus follow-up diffs when the
        // anchor predates `end` — e.g. a history-anchored start)
        val anchor = startingVersion.getOrElse(endV)
        (anchor to endV).foreach(v => if (!vs.contains(v))
          throw new IllegalStateException(
            s"version $v vacuumed from ${vt.root} (surviving: $vs); cannot " +
              "replay the anchor batch exactly — raise the vacuum " +
              "retention above the stream's trigger lag"))
        val follow = vs.filter(v => v > anchor && v <= endV)
        (anchor +: follow).sliding(2).collect { case Seq(a, b) =>
          vt.changesByKey(a, b, keyCols)
            .withColumn("_commit_version", lit(b))
            .select(outCols: _*)
        }.foldLeft(snapshotAsInserts(anchor))(_ unionAll _)
      case Some(s) =>
        val sV = ver(s)
        // the checkpointed offset itself AND every covered version must
        // survive retention: anchoring on an older survivor would re-emit
        // already-delivered diffs, and a hole inside the window would
        // collapse several commits' deltas under one _commit_version —
        // fail loudly instead (the Delta CDF retention contract, matching
        // GraftMicroBatchStream's vacuumed-window error)
        (sV to endV).foreach(v => if (!vs.contains(v))
          throw new IllegalStateException(
            s"version $v vacuumed from ${vt.root}; cannot replay changes " +
              s"after checkpointed offset $sV exactly — raise the vacuum " +
              "retention above the stream's trigger lag"))
        val within = vs.filter(v => v > sV && v <= endV)
        (sV +: within).sliding(2).collect { case Seq(a, b) =>
          vt.changesByKey(a, b, keyCols)
            .withColumn("_commit_version", lit(b))
            .select(outCols: _*)
        }.reduceOption(_ unionAll _)
          .getOrElse(snapshotAsInserts(endV).limit(0))
    }
    GraftColumnBridge.streamingFrame(spark, batch)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftChangeSource[${vt.root}, keys=${keyCols.mkString(",")}]"
}
