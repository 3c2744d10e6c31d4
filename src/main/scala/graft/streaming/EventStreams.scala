package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape.
  *
  * The reference is batch-only (SURVEY.md §2.9); this module is the
  * scale-mode upgrade path: the same tumbling aggregate as the batch query
  * `ev_tumbling_hourly` expressed as a watermarked streaming plan, plus
  * session windows. Batch/stream parity is pinned by
  * [[graft.StreamingSpec]], which runs both over the same files through the
  * memory sink.
  *
  * At scale: watermark bounds state (late events beyond 10 min are
  * dropped); the aggregation state is hash-partitioned by
  * (window, event_type) — the same shuffle key the batch plan uses.
  */
object EventStreams {

  /** Legacy file-source schema: ts as raw long nanos (the JSONL replay
    * shape used by the parity specs' hand-written fixtures, and the old
    * TIMESTAMP(NANOS)-parquet-as-long read).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of an events parquet path. Point this at the events
    * files specifically (e.g. `<sfDir>/events.parquet`), NOT a directory of
    * mixed tables — the file source globs every parquet underneath and
    * schema-fills foreign files with nulls.
    *
    * A streaming file source needs its schema declared up front, but the
    * events table has shipped with three `ts` physical shapes (see
    * [[graft.Tables.events]]): TIMESTAMP(NANOS) read as long,
    * TIMESTAMP(MICROS) without UTC adjustment (surfaces as
    * TIMESTAMP_NTZ), and session-zoned TIMESTAMP. One batch FOOTER read
    * (metadata only — no row scan) probes the actual type, then the
    * streaming schema + normalization match it, so every downstream
    * watermark/window sees session-zoned TimestampType micros regardless
    * of which vintage of the file is on disk.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(path).schema("ts").dataType
    val schema = StructType(rawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    val raw = spark.readStream.schema(schema).parquet(path)
    tsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // UTC-pinned session: a micros-identity relabel, not a conversion
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Watermarked 1-hour tumbling aggregate per event type — streaming twin
    * of the `ev_tumbling_hourly` batch query (same groups, same outputs).
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarked stream-stream interval join: each purchase joined to the
    * same user's clicks in `[purchase.ts - delta, purchase.ts]` — the
    * streaming twin of the batch as-of/range-join family. The event-time
    * bound plus watermarks lets Spark EXPIRE join state on both sides
    * (without the time condition, stream-stream state grows forever);
    * inner-join results emit as soon as both rows arrive.
    *
    * `joinType = "leftOuter"` keeps click-less purchases: the null-match
    * row can only emit once the watermark proves no future click will
    * arrive for the interval, so outer results trail the watermark by
    * design (Spark runs a no-data micro-batch to flush them when the
    * watermark advances past the state). A purchase near the end of the
    * stream whose interval the watermark never clears stays unemitted —
    * drive the watermark past it (ev_stream_outer_join stages far-future
    * sentinel rows) or accept the trailing tail.
    */
  def purchaseClickJoin(events: DataFrame, deltaSeconds: Long,
                        joinType: String = "inner"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    val joined = purchases.join(clicks, expr(
      s"""user_id = c_user_id AND
         |c_ts >= ts - INTERVAL $deltaSeconds SECONDS AND
         |c_ts <= ts""".stripMargin), joinType)
    // semi joins surface left columns only — there is no match row to carry
    if (joinType == "leftSemi") joined
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    else joined
      .select(col("event_id"), col("user_id"), col("ts"),
        col("c_user_id"), col("c_ts"), col("c_value"))
  }

  /** Streaming exact dedup on the event id, state bounded by the
    * watermark — the streaming half of the dedup family (replayed/
    * at-least-once sources re-deliver rows; this makes the pipeline
    * idempotent at ingest).
    *
    * `delay` is the REDELIVERY HORIZON: a duplicate is guaranteed dropped
    * only if it arrives while the original's event time is still within
    * the watermark. Size it to the source's replay window (a Kafka
    * retention, a backfill lag); state is one key per id inside the
    * horizon — the knob that bounds memory at 100 TB ingest rates.
    */
  def dedupEvents(events: DataFrame,
                  delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Session windows per user with a 30-minute inactivity gap — streaming
    * twin of the `ev_sessions` batch query's session definition.
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"))
}
