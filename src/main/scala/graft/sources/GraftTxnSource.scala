package graft.sources

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The transaction manifest as a LIVE streaming source —
  * `spark.readStream.format("graft").option("txnLog", root)
  * .option("table", name).option("keyCols", …).load(memberRoot)`:
  * offsets are TRANSACTION IDS read straight from `_txnlog`, so stamps
  * landing after the stream starts are picked up at the next trigger —
  * the log-following capability [[MultiTableTxn.streamChanges]] (which
  * spools a fixed stamp set at call time) cannot express, exactly the
  * [[GraftChangeSource]] ↔ [[ChangeFeed.streamChanges]] relationship one
  * level up the stack.
  *
  * Semantics per batch window `(start, end]` of stamps: the member's
  * keyed diff between CONSECUTIVE PINS, one sub-diff per stamp that moved
  * the pin (`_change_type` ∈ insert/delete/update_preimage/
  * update_postimage, `_commit_version` = the pinned member version,
  * `_txn_id` = the stamp); carry-forward stamps (the pin did not move)
  * contribute no rows but still advance the offset. The first batch is
  * the anchor stamp's pinned read as inserts (snapshot-then-follow;
  * `startingTxn` anchors history instead — inclusive). A member commit
  * STAGED but never stamped is invisible at every trigger — the
  * all-or-nothing visibility of [[MultiTableTxn.readAt]], streamed live;
  * the member's own change stream would leak it.
  *
  * Retention contract (the Delta-CDF discipline): every stamp in a
  * planned window must still exist — a vacuumed stamp inside the window
  * would silently collapse several transactions' deltas, so the source
  * fails loudly and the fix is raising `txn.vacuum`'s `keepTxns` above
  * the stream's trigger lag. Flat members only: a sharded member's
  * cross-partition stream is its coordinator changes table.
  */
final class GraftTxnSource(spark: SparkSession, txn: MultiTableTxn,
                           table: String, keyCols: Seq[String],
                           startingTxn: Option[Long]) extends Source {

  private def pinAt(id: Long): (String, Long) =
    txn.vector(id).getOrElse(table, throw new IllegalArgumentException(
      s"transaction $id records no table '$table'"))

  // the stream-long schema, pinned at source creation (same contract as
  // the table-level change source: a mid-stream member schema change is
  // not silently absorbed)
  override val schema: StructType = {
    val last = txn.latest.getOrElse(throw new IllegalStateException(
      "no stamped transaction in the log — stamp a bootstrap first"))
    val (root, v) = pinAt(last)
    require(txn.shardedOf(root).isEmpty,
      s"txn stream supports flat members; sharded member '$table' " +
        "streams via its coordinator changes table")
    val dataSchema = new VersionedTable(spark, root).schemaOf(v).getOrElse(
      throw new IllegalStateException(
        s"no committed schema for pinned version $v at $root"))
    StructType(dataSchema.fields ++ Seq(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false),
      StructField("_txn_id", LongType, nullable = false)))
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other               => other.json.toLong
  }

  override def getOffset: Option[Offset] = txn.latest.map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endT = ver(end)
    val ids = txn.txns
    val live = ids.toSet
    val outCols = schema.fieldNames.toSeq.map(n => col(s"`$n`"))
    def requireLive(from: Long): Unit =
      (from to endT).foreach(t => if (!live.contains(t))
        throw new IllegalStateException(
          s"transaction $t vacuumed from the log (surviving: $ids); " +
            "cannot replay this batch exactly — raise txn.vacuum's " +
            "keepTxns above the stream's trigger lag"))
    def snapshotAsInserts(t: Long): DataFrame = {
      val (root, v) = pinAt(t)
      new VersionedTable(spark, root).readVersion(v)
        .withColumn("_change_type", lit("insert"))
        .withColumn("_commit_version", lit(v))
        .withColumn("_txn_id", lit(t))
        .select(outCols: _*)
    }
    def diffs(from: Long): Seq[DataFrame] = {
      val (root0, v0) = pinAt(from)
      val vt = new VersionedTable(spark, root0)
      var pv = v0
      ids.filter(t => t > from && t <= endT).flatMap { t =>
        val (r, v) = pinAt(t)
        require(r == root0,
          s"table '$table' moved roots mid-log ($root0 -> $r) — re-anchor")
        if (v == pv) None // carry-forward stamp: no rows, offset advances
        else {
          val d = vt.changesByKey(pv, v, keyCols)
            .withColumn("_commit_version", lit(v))
            .withColumn("_txn_id", lit(t))
            .select(outCols: _*)
          pv = v
          Some(d)
        }
      }
    }
    val frame = start match {
      case None =>
        val anchor = startingTxn.getOrElse(endT)
        requireLive(anchor)
        diffs(anchor).foldLeft(snapshotAsInserts(anchor))(_ unionAll _)
      case Some(o) =>
        val sT = ver(o)
        requireLive(sT)
        diffs(sT).reduceOption(_ unionAll _)
          .getOrElse(snapshotAsInserts(endT).limit(0))
    }
    GraftColumnBridge.streamingFrame(spark, frame)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"GraftTxnSource[$table, keys=${keyCols.mkString(",")}]"
}
