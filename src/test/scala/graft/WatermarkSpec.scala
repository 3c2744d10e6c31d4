package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Late-data semantics: in append mode a watermarked tumbling window emits
  * once the watermark passes its end, and events arriving after that are
  * dropped — the state-bounding contract that makes the aggregation safe at
  * scale.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, String, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts_str", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        // micros→nanos long, matching the events file contract
        (unix_timestamp(to_timestamp(col("ts_str"))) * lit(1000000000L)).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("append").parquet(s"$dir/$name")

  test("append-mode tumbling window drops events later than the watermark") {
    val dir = Files.createTempDirectory("graft_wm").toString
    val src = s"$dir/in"
    val ckpt = s"$dir/ckpt"

    // batch 1: two events in the 10:00 window, one at 11:59 that pushes the
    // watermark (11:59 - 10min = 11:49) past the 10:00 window's end
    writeBatch(src, "b1", Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:30:00", 1L, "click", 1.0, "{}"),
      (3L, "2024-01-01 11:59:00", 1L, "click", 1.0, "{}")))

    val stream = EventStreams.tumblingHourly(
      spark.readStream.schema(EventStreams.rawSchema).parquet(s"$src/*")
        .withColumn("ts", timestamp_micros(expr("ts div 1000"))))
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("wm_out").start()
    try {
      q.processAllAvailable()
      // two more micro-batches: a LATE event for the finalized 10:00 window,
      // then an on-time event advancing the clock so 11:00 finalizes too
      writeBatch(src, "b2", Seq(
        (4L, "2024-01-01 10:45:00", 1L, "click", 1.0, "{}")))
      q.processAllAvailable()
      writeBatch(src, "b3", Seq(
        (5L, "2024-01-01 13:30:00", 1L, "click", 1.0, "{}")))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("wm_out")
      .select("window_start", "n").as[(String, Long)].collect().toMap
    // 10:00 window finalized with the on-time events only — late id 4 dropped
    assert(out("2024-01-01 10:00:00") == 2L)
    // 11:00 window finalized after batch 3 advanced the watermark
    assert(out("2024-01-01 11:00:00") == 1L)
    // 13:00 window still open (watermark 13:20), not emitted in append mode
    assert(!out.contains("2024-01-01 13:00:00"))
  }
}
