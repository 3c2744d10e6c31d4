package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Batch/stream parity: the streaming tumbling aggregate over the events
  * files must produce exactly the batch aggregate of the same input.
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling hourly == batch aggregate (complete mode)") {
    val dir = sf("sf0.001")
    val q = EventStreams.tumblingHourly(EventStreams.readEvents(spark, s"$dir/events.parquet*"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("stream_out")
      .select("window_start", "event_type", "n", "sum_value")

    val batch = Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming session_window == batch lag-gap sessionization") {
    val dir = sf("sf0.001")
    val q = EventStreams.userSessions(
      EventStreams.readEvents(spark, s"$dir/events.parquet*"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_parity_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("sess_parity_out")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val batch = SparkEntry.all("ev_sessions").build(spark, dir)
      .select("user_id", "n_sessions")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("session windows produce sane per-user sessions") {
    val dir = sf("sf0.001")
    val q = EventStreams.userSessions(EventStreams.readEvents(spark, s"$dir/events.parquet*"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val sessions = spark.table("sessions_out")
    val nUsers = Tables.events(spark, dir).select("user_id").distinct().count()
    assert(sessions.select("user_id").distinct().count() == nUsers)
    assert(sessions.agg(min(col("n_events"))).head.getLong(0) >= 1L)
  }
}
