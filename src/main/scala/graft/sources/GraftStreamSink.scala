package graft.sources

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink

/** `spark.writeStream.format("graft")` — the governed table as an
  * EXACTLY-ONCE streaming sink (the write-side complement of
  * [[GraftChangeSource]]: with both, a graft table is a full streaming
  * peer — log-following source and idempotent sink on one commit
  * protocol).
  *
  * Exactly-once discipline (the Delta-sink idempotent-transaction model):
  * every committed micro-batch stamps its manifest operation
  * `stream_append:<queryId>:<batchId>`. On `addBatch`, the sink consults
  * the transaction log for the highest batch this QUERY already committed
  * — a batch at or below it is a checkpoint-recovery replay and is
  * SKIPPED, so a crash between table commit and checkpoint write cannot
  * double-append. The query id comes from the streaming execution's local
  * property (stable across restarts from the same checkpoint); the log
  * scan runs once per query start and is cached driver-side afterward.
  *
  * Appends are blind (no read of existing data, conflict-retried), so a
  * streaming sink interleaves safely with batch writers and other
  * streaming queries on the same table — each query's ledger is keyed by
  * its own id. Append output mode only: update/complete modes rewrite
  * keys in place, which an append-only ledger cannot represent (MERGE via
  * `foreachBatch` + [[VersionedTable.mergeRetrying]] is the documented
  * upsert path).
  */
final class GraftStreamSink(spark: SparkSession, vt: VersionedTable,
                            mergeSchema: Boolean)
    extends Sink {

  /** Streaming query id local property (set by the stream execution
    * thread for exactly this purpose — public Spark contract, also what
    * file-format sinks key their logs on).
    */
  private val queryIdKey = "sql.streaming.queryId"

  private val opPrefix = "stream_append:"

  // (queryId, highest committed batch) — cache of the ledger lookup
  private var lastCommitted: Option[(String, Long)] = None

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val qid = Option(spark.sparkContext.getLocalProperty(queryIdKey))
      .getOrElse("no-query-id")
    // ledger = live manifests ∪ the vacuum-proof sidecar (see
    // VersionedTable.streamLedgerGet); scanned once per query run
    val last = lastCommitted match {
      case Some((q, b)) if q == qid => Some(b)
      case _ => vt.streamLedgerGet(qid)
    }
    if (last.exists(_ >= batchId)) {
      lastCommitted = Some((qid, last.get))
      return // checkpoint-recovery replay of an already-committed batch
    }
    // the addBatch frame is rooted in the incremental plan — re-root it
    // as a batch frame before handing it to the normal write path
    val batchDf = GraftColumnBridge.batchFrame(spark, data)
    vt.appendRetrying(batchDf, mergeSchema,
      operation = s"$opPrefix$qid:$batchId")
    vt.streamLedgerPut(qid, batchId)
    lastCommitted = Some((qid, batchId))
  }

  override def toString: String = s"GraftStreamSink[${vt.root}]"
}
