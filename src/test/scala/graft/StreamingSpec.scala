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

  test("stream-stream interval join == batch interval join") {
    val dir = sf("sf0.001")
    val q = EventStreams.purchaseClickJoin(
        EventStreams.readEvents(spark, s"$dir/events.parquet*"), 600L)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ssjoin_out")
      .select("event_id", "user_id", "ts", "c_ts", "c_value")

    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val batch = p.join(c, col("user_id") === col("cu") &&
        col("c_ts") >= col("ts") - expr("INTERVAL 600 SECONDS") &&
        col("c_ts") <= col("ts"))
      .select("event_id", "user_id", "ts", "c_ts", "c_value")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup drops replayed rows (idempotent ingest)") {
    val dir = java.nio.file.Files.createTempDirectory("dedup_src")
    // same rows delivered twice (two files) = an at-least-once replay
    val lines = Seq(
      """{"event_id": 1, "ts": 1000000000000, "user_id": 1, "event_type": "view", "value": 1.0, "props": "{}"}""",
      """{"event_id": 2, "ts": 1000000001000, "user_id": 1, "event_type": "view", "value": 2.0, "props": "{}"}""")
    java.nio.file.Files.write(dir.resolve("a.jsonl"),
      lines.mkString("\n").getBytes)
    java.nio.file.Files.write(dir.resolve("b.jsonl"),
      lines.mkString("\n").getBytes)
    val src = spark.readStream.schema(EventStreams.rawSchema).json(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = EventStreams.dedupEvents(src)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("dedup_out").count() == 2) // 4 delivered, 2 unique
  }

  test("batch lag-gap: a successor at EXACTLY the gap continues the session " +
    "(strict-> boundary, matching session_window's merge-contiguous windows)") {
    import spark.implicits._
    // three events: t0, t0+gap (exact boundary -> CONTINUES), t0+gap+100
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    val fixture = Seq(
      (1L, 7L, java.sql.Timestamp.from(t0), "click", 1.0),
      (2L, 7L, java.sql.Timestamp.from(t0.plusSeconds(1800L)), "click", 1.0),
      (3L, 7L, java.sql.Timestamp.from(t0.plusSeconds(1900L)), "click", 1.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("gapfix").toString
    fixture.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.all("ev_sessions").build(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_sessions") == 1L,
      s"exact-gap successor must continue the session: ${out.toSeq}")
    assert(out.head.getAs[Long]("n_events") == 3L)
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
