package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.VersionedTable

/** Streaming upsert into a [[VersionedTable]] — the `foreachBatch` MERGE
  * idiom (the standard Delta/Iceberg streaming-CDC sink, expressed over the
  * engine's own transaction log): each micro-batch is first collapsed to
  * its latest row per key, then transactionally MERGEd, so the table always
  * holds exactly one current row per key and every micro-batch is one
  * committed version.
  *
  * Idempotence on replay: MERGE is latest-`orderCol`-wins with
  * updates-preferred ties, so re-processing a batch after a restart
  * re-asserts the same rows — same final state, just an extra version in
  * the log (checkpointed offsets make replays rare; harmless when they
  * happen).
  *
  * At scale: the in-batch collapse is one window over the batch (small);
  * the MERGE cost is the copy-on-write rewrite — partition the table (one
  * VersionedTable per partition) exactly as noted on [[VersionedTable]].
  */
object UpsertSink {

  /** Collapse a batch to its latest row per key — deterministic given a
    * `tieCols` that breaks `orderCol` ties (pass the source's unique id).
    */
  def latestPerKey(batch: DataFrame, keyCols: Seq[String], orderCol: String,
                   tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc_nulls_last +: tieCols.map(col(_).desc): _*)
    batch.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Start the stream: `df` (a streaming DataFrame) upserted into `table`
    * keyed on `keyCols`, newest `orderCol` wins.
    *
    * `autoCompactDirs > 0` bounds fragmentation after each batch. With
    * `autoPackRows > 0` the action is bin-packing
    * ([[VersionedTable.packIfFragmented]] — only sub-threshold dirs
    * rewrite, consolidated dirs graduate and never re-pay); otherwise the
    * full-snapshot [[VersionedTable.compactIfFragmented]], acceptable only
    * while the table itself is small.
    */
  def start(df: DataFrame, table: VersionedTable, keyCols: Seq[String],
            orderCol: String, tieCols: Seq[String], checkpoint: String,
            autoCompactDirs: Int = 0, autoPackRows: Long = 0L): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // retrying writes: an EXTERNAL writer racing the sink (a
          // backfill merge, an ad-hoc OPTIMIZE) must not kill the
          // stream — the merge recomputes serializably, the pack
          // rebases across pure appends (disjoint-file rule)
          table.mergeRetrying(latestPerKey(batch, keyCols, orderCol,
            tieCols), keyCols, orderCol)
          if (autoCompactDirs > 0) {
            if (autoPackRows > 0)
              table.packIfFragmented(autoCompactDirs, autoPackRows,
                maxAttempts = 5)
            else table.compactIfFragmented(autoCompactDirs)
          }
        }
        ()
      }
      .start()

  /** [[start]] plus a streaming-maintained materialized aggregate: after
    * each micro-batch MERGE, the `(dims…, n_rows, sum_value)` view in `view`
    * is refreshed from the base table's change feed
    * ([[graft.operators.IncrementalAgg.maintain]]) — first batch bootstraps.
    *
    * The scale point of pairing the two: the serving aggregate stays fresh
    * at micro-batch cadence for O(batch changes) per refresh, instead of a
    * downstream job re-aggregating the whole base table each trigger.
    *
    * Crash consistency: the refresh span is `view watermark → this commit`
    * ([[graft.operators.IncrementalAgg.appliedThrough]]), NOT "previous
    * base version → this commit" — so a crash between the MERGE and the
    * refresh just widens the next batch's span instead of losing a commit's
    * deltas, a replayed batch re-asserts identical rows (empty CDF slice,
    * view untouched), and a view emptied of every group (no watermark left)
    * re-bootstraps from the base snapshot. The pair stays consistent under
    * at-least-once delivery.
    */
  def startWithView(df: DataFrame, table: VersionedTable,
                    view: VersionedTable, keyCols: Seq[String],
                    orderCol: String, tieCols: Seq[String], dims: Seq[String],
                    valueCol: String, checkpoint: String,
                    autoCompactDirs: Int = 0): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.operators.IncrementalAgg
          val to = table.mergeRetrying(
            latestPerKey(batch, keyCols, orderCol, tieCols),
            keyCols, orderCol)
          if (view.latestVersion.isEmpty) {
            IncrementalAgg.bootstrap(view, table, dims, valueCol)
          } else IncrementalAgg.appliedThrough(view) match {
            case Some(hwm) => IncrementalAgg.maintain(
              view, table, hwm, to, keyCols, dims, valueCol)
            case None => // every group deleted: no watermark — re-derive
              IncrementalAgg.bootstrap(view, table, dims, valueCol)
          }
          // both tables gain a dir per batch; bound the fragmentation.
          // NOTE: the view refresh must see the PRE-compaction `to`
          // version, so compaction runs strictly after it.
          if (autoCompactDirs > 0) {
            table.compactIfFragmented(autoCompactDirs)
            view.compactIfFragmented(autoCompactDirs)
          }
        }
        ()
      }
      .start()
}
