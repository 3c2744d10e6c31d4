package graft

import org.apache.spark.sql.functions._

import graft.streaming.{EventStreams, StatefulStreams}

/** Custom keyed state: running user totals in update mode must converge to
  * the batch per-user aggregates.
  */
class StatefulStreamSpec extends SparkSpec {

  test("mapGroupsWithState running totals converge to batch totals") {
    val dir = sf("sf0.001")
    val q = StatefulStreams
      .runningUserTotals(EventStreams.readEvents(spark, s"$dir/events.parquet*"))
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    // last update per user is the final running total
    val latest = spark.table("totals_out")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max(col("total_value")).as("total_value"))

    val batch = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

    val joined = latest.as("s").join(batch.as("b"), "user_id")
      .filter(col("s.n_events") =!= col("b.n_events") ||
        abs(col("s.total_value") - col("b.total_value")) > 1e-6)
    assert(joined.isEmpty)
    assert(latest.count() == batch.count())
  }

  test("flatMapGroupsWithState timeout sessions == batch session_window") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulStreams.SessionEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = sf("sf0.001")
    val gap = 1800L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .as[SessionEvent].collect()
    val maxTs = ev.map(_.ts.toEpochMilli).max

    val in = MemoryStream[SessionEvent]
    val q = graft.streaming.StatefulStreams
      .timeoutSessions(in.toDF(), gapSeconds = gap)
      .writeStream.outputMode("append")
      .format("memory").queryName("timeout_sessions_out")
      .start()
    try {
      in.addData(ev.toSeq)
      q.processAllAvailable()
      // two watermark-advancing sentinels: the first fires timeouts for
      // sessions closed by real data's watermark, the second fires the
      // rest (timeouts use the PREVIOUS batch's watermark)
      val flush1 = maxTs + (gap + 700 + 3600) * 1000L
      in.addData(SessionEvent(-1L, java.time.Instant.ofEpochMilli(flush1)))
      q.processAllAvailable()
      in.addData(SessionEvent(-2L,
        java.time.Instant.ofEpochMilli(flush1 + (gap + 700 + 3600) * 1000L)))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("timeout_sessions_out")
      .filter(col("user_id") >= 0) // sentinel users are plumbing
      .select(col("user_id"), col("session_start"), col("n_events"))

    val batch = Tables.events(spark, dir)
      .groupBy(session_window(col("ts").cast("timestamp"), s"$gap seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("a successor at EXACTLY the gap CONTINUES the session in all three " +
    "implementations (the merge-contiguous boundary the lag-gap oracle " +
    "replays with strict >)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulStreams.SessionEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val gap = 1800L
    val t0 = java.time.Instant.parse("2024-03-01T00:00:00Z")
    // event 2 lands exactly gap seconds after event 1: session_window
    // MERGES contiguous windows, and both stateful processors continue
    // on delta <= gap to match — so all three events form ONE session
    val ev = Seq(
      SessionEvent(7L, t0),
      SessionEvent(7L, t0.plusSeconds(gap)),
      SessionEvent(7L, t0.plusSeconds(gap + 100)))
    val expected = Set((3L, t0.toString))

    val batch = ev.toDF()
      .groupBy(session_window(col("ts"), s"$gap seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("n_events"), col("session_window.start").as("session_start"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString))
      .toSet
    assert(batch == expected, s"session_window: $batch")

    val in = MemoryStream[SessionEvent]
    val q = StatefulStreams.timeoutSessions(in.toDF(), gapSeconds = gap)
      .writeStream.outputMode("append")
      .format("memory").queryName("gap_boundary_out")
      .start()
    try {
      in.addData(ev)
      q.processAllAvailable()
      val flush1 = t0.toEpochMilli + (3 * gap + 3600) * 1000L
      in.addData(SessionEvent(-1L, java.time.Instant.ofEpochMilli(flush1)))
      q.processAllAvailable()
      in.addData(SessionEvent(-2L,
        java.time.Instant.ofEpochMilli(flush1 + (3 * gap + 3600) * 1000L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("gap_boundary_out")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getAs[Long]("n_events"),
        r.getAs[java.sql.Timestamp]("session_start").toInstant.toString))
      .toSet
    assert(streamed == expected, s"timeoutSessions: $streamed")
  }

  test("transformWithState sessions == batch session_window (RocksDB)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StatefulStreams.SessionEvent
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = sf("sf0.001")
    val gap = 1800L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .as[SessionEvent].collect()
    val maxTs = ev.map(_.ts.toEpochMilli).max

    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[SessionEvent]
    val q = graft.streaming.StatefulStreams
      .twsSessions(in.toDF(), gapSeconds = gap)
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_sessions_out")
      .start()
    try {
      in.addData(ev.toSeq)
      q.processAllAvailable()
      val flush1 = maxTs + (gap + 700 + 3600) * 1000L
      in.addData(SessionEvent(-1L, java.time.Instant.ofEpochMilli(flush1)))
      q.processAllAvailable()
      in.addData(SessionEvent(-2L,
        java.time.Instant.ofEpochMilli(flush1 + (gap + 700 + 3600) * 1000L)))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }

    val streamed = spark.table("tws_sessions_out")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("n_events"))

    val batch = Tables.events(spark, dir)
      .groupBy(session_window(col("ts").cast("timestamp"), s"$gap seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
