package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.QueryDef.round6

/** Event-stream analytics in batch form over the `events` table. The
  * tumbling-window aggregate is the batch twin of the Structured Streaming
  * query in [[graft.streaming.EventStreams]] (same grouping, same schema), so
  * the oracle here also pins the streaming semantics.
  */
object EventQueries {

  /** Shared harness for the OUTER stream-stream join gates: stage events
    * as 4 time-range file batches (batch k's min ts exceeds batch k−1's
    * max, so no row is ever late) plus a final far-future sentinel batch —
    * one row per join side with disjoint NEGATIVE user ids — admitted
    * last. The sentinels push BOTH sides' watermarks past every real
    * event, so the no-data batch flushes every null-match outer row
    * deterministically; they never join and filter out of the result.
    * Returns (file-source stream, staging root).
    */
  private def sentinelStagedStream(s: org.apache.spark.sql.SparkSession,
                                   dir: String, tag: String)
      : (org.apache.spark.sql.DataFrame, String) = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_${s.sparkContext.applicationId}"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val ev = Tables.events(s, dir)
    ev.repartitionByRange(4, col("ts"))
      .write.mode("overwrite").parquet(s"$root/src")
    val farFuture = ev.agg(max(col("ts")).as("m"))
      .select(
        explode(array(
          struct(lit(-1L).as("event_id"),
            col("m") + expr("INTERVAL 30 DAYS"),
            lit(-1L).as("user_id"), lit("purchase").as("event_type"),
            lit(0.0).as("value"), lit("{}").as("props")),
          struct(lit(-2L).as("event_id"),
            col("m") + expr("INTERVAL 30 DAYS"),
            lit(-2L).as("user_id"), lit("click").as("event_type"),
            lit(0.0).as("value"), lit("{}").as("props")))).as("r"))
      .select("r.*").toDF(ev.columns: _*)
    farFuture.coalesce(1).write.mode("overwrite").parquet(s"$root/sentinel")
    // admission order: 4 time-range batches, then the sentinel batch —
    // the file source admits oldest-mtime-first, and one parallel write
    // leaves part files with arbitrary mtimes, so pin them explicitly
    val parts = (fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/src"))
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName) ++
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/sentinel"))
        .filter(_.getPath.getName.startsWith("part-")))
    val base = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (st, i) =>
      val dst = new org.apache.hadoop.fs.Path(s"$root/in/f$i.parquet")
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs, dst, false,
        s.sparkContext.hadoopConfiguration)
      fs.setTimes(dst, base + i * 1000L, -1L)
    }
    (s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in"), root)
  }

  val defs: Map[String, QueryDef] = Map(

    // tumbling 1h window counts/sums per event type
    "ev_tumbling_hourly" -> QueryDef(
      build = (s, dir) => round6(Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          (sum(col("value").cast("decimal(18,2)")).cast("double") / count(lit(1)))
            .as("avg_value"))),
      oracle = Some(
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
          |       event_type, count(*) AS n,
          |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value,
          |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_value
          |FROM events GROUP BY 1, 2""".stripMargin),
      headline = true
    ),

    // first-order Markov transition matrix over per-user event sequences:
    // lag-pair counts row-normalized into transition probabilities — the
    // behavioral-model summary downstream of sessionization. One window
    // shuffle for the lead pairing, one hash agg, one event-type-wide
    // (5-row partitions) normalization window; counts exact, the single
    // probability division is the same integer-operand double op on both
    // engines.
    "ev_transitions" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, dir)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
          .withColumn("p", round(col("n") /
            sum(col("n")).over(Window.partitionBy("event_type")), 6))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT event_type,
          |         lead(event_type) OVER (PARTITION BY user_id
          |           ORDER BY ts, event_id) AS next_type
          |  FROM events)
          |SELECT event_type, next_type, count(*) AS n,
          |       round(count(*) / CAST(sum(count(*)) OVER
          |         (PARTITION BY event_type) AS DOUBLE), 6) AS p
          |FROM t WHERE next_type IS NOT NULL
          |GROUP BY 1, 2""".stripMargin)
    ),

    // hopping (sliding) 1h windows every 15 min — OVERLAPPING window
    // semantics, each event lands in exactly 4 epoch-aligned windows (the
    // tumbling query covers the disjoint case). Spark plans this as a
    // map-side Expand (4 rows per event) feeding the same hash agg — no
    // extra shuffle vs tumbling; the identical `window(ts, dur, slide)`
    // call works under readStream with a watermark. The oracle replays
    // the window membership as explicit k-offset arithmetic in exact
    // integer micros.
    "ev_hopping_hourly" -> QueryDef(
      build = (s, dir) => round6(Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))),
      oracle = Some(
        """WITH h AS (
          |  SELECT event_type, value,
          |         epoch_us(ts) - (epoch_us(ts) % 900000000)
          |           - k * 900000000 AS ws_us
          |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k) t)
          |SELECT strftime(make_timestamp(ws_us), '%Y-%m-%d %H:%M:%S') AS window_start,
          |       event_type, count(*) AS n,
          |       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value
          |FROM h GROUP BY 1, 2""".stripMargin)
    ),

    // resample + gap fill: per-user 15-minute grid between the user's
    // first and last active bucket, EMPTY BUCKETS EMITTED (n=0) — the
    // md5 of the ordered per-user count series pins the whole filled grid
    // (bucket arithmetic in exact integer micros on both engines; a float
    // division would break above 2^53)
    "ev_resample_gapfill" -> QueryDef(
      build = (s, dir) => {
        val filled = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("user_id"),
          bucketMicros = 900000000L)
        filled.groupBy("user_id").agg(
          count(lit(1)).as("n_buckets"),
          sum(when(col("n") === 0, 1).otherwise(0)).as("n_gaps"),
          md5(concat_ws(",",
            transform(sort_array(collect_list(struct(col("bucket_us"), col("n")))),
              x => x.getField("n").cast("string")))).as("series_md5"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT user_id,
          |         epoch_us(ts) - (epoch_us(ts) % 900000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT user_id, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT user_id, unnest(range(lo, hi + 900000000, 900000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.user_id, g.bucket_us, coalesce(b.n, 0) AS n
          |  FROM grid g LEFT JOIN b ON g.user_id = b.user_id
          |                         AND g.bucket_us = b.bucket_us)
          |SELECT user_id,
          |       count(*) AS n_buckets,
          |       CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
          |       md5(string_agg(CAST(n AS VARCHAR), ',' ORDER BY bucket_us)) AS series_md5
          |FROM f GROUP BY user_id""".stripMargin)
    ),

    // as-of join: each purchase attributed to the user's latest prior click
    "ev_asof_attribution" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val clicks = ev.filter(col("event_type") === "click")
        round6(graft.operators.AsOfJoin
          .asofLeft(purchases, clicks, keyCol = "user_id", tsCol = "ts",
            payloadCols = Seq("value"), tieCol = "event_id")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            col("right_value").as("click_value")))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
          |       round(c.value, 6) AS click_value
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)
    ),

    // custom keyed state end-to-end: events staged as 4 files → file
    // stream, one file per micro-batch → mapGroupsWithState running
    // per-user (count, cents) totals in update mode → the FINAL state per
    // user (the snapshot at max running count; the count strictly
    // increases, so max-struct picks it). Integer cents make the final
    // state batch-split- and order-invariant, so a plain SQL aggregate
    // replays the whole stateful query — the oracle gate for
    // mapGroupsWithState (per-event floor(value*100) is the same IEEE
    // double product in both engines).
    "ev_stateful_totals" -> QueryDef(
      build = (s, dir) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_mgws_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val ev = Tables.events(s, dir)
        ev.repartitionByRange(4, col("event_id"))
          .write.mode("overwrite").parquet(s"$root/src")
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
        val qn = s"mgws_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.StatefulStreams.runningUserCents(stream)
          .writeStream.outputMode("update")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn)
          .groupBy("user_id")
          .agg(max(struct(col("n_events"), col("total_cents"))).as("m"))
          .select(col("user_id"), col("m.n_events").as("n_events"),
            col("m.total_cents").as("total_cents"))
      },
      oracle = Some(
        """SELECT user_id, count(*) AS n_events,
          |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
          |FROM events GROUP BY user_id""".stripMargin)
    ),

    // stream-stream interval join end-to-end: events staged as 4
    // TIME-ordered files → file stream, one file per micro-batch → the
    // watermarked purchase⋈click interval join in append mode. Time-range
    // staging means no row is ever late (each batch's min ts exceeds the
    // prior batch's max), so the watermark only EXPIRES state, never drops
    // input — click state for the 4-hour join window is retained across
    // batch boundaries, which is exactly what the gate must prove: a
    // purchase in batch k matching a click from batch k-1 only joins if
    // cross-batch state management is right. Inner-join results emit
    // eagerly (no watermark wait), so the memory sink holds every pair,
    // and a plain batch interval join replays it — the oracle gate for
    // stream-stream joins (closes the last spec-only §2.9 operator).
    "ev_stream_join" -> QueryDef(
      build = (s, dir) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_ssj_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val ev = Tables.events(s, dir)
        ev.repartitionByRange(4, col("ts"))
          .write.mode("overwrite").parquet(s"$root/src")
        // the file source admits files oldest-mtime-first, but one parallel
        // write leaves the 4 part files with arbitrary mtimes — pin the
        // batch order to ascending ts (range bucket k = part-0000k) so
        // "no late rows" holds by construction, not by write-timing luck
        val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/src"))
          .filter(_.getPath.getName.startsWith("part-"))
          .sortBy(_.getPath.getName)
        val base = System.currentTimeMillis()
        parts.zipWithIndex.foreach { case (st, i) =>
          fs.setTimes(st.getPath, base + i * 1000L, -1L)
        }
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
        val qn = s"ssj_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.EventStreams
          .purchaseClickJoin(stream, deltaSeconds = 14400L)
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn).select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          round(col("c_value"), 6).as("click_value"))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
          |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
          |       round(c.value, 6) AS click_value
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON p.user_id = c.user_id
          | AND c.ts >= p.ts - INTERVAL 14400 SECONDS
          | AND c.ts <= p.ts""".stripMargin)
    ),

    // Streaming exact dedup at ingest (dropDuplicatesWithinWatermark):
    // the at-least-once-source gate. Events stage as 4 delivery files
    // plus a 5th REPLAY file re-delivering every 7th event — the
    // duplicate-on-retry shape Kafka/SQS consumers see — with the
    // watermark horizon sized past the table's full ts span so every
    // redelivery is inside the dedup state window. The memory sink must
    // then hold the original events exactly once: the batch aggregate
    // over the pristine table IS the oracle, and any leaked duplicate
    // inflates a count, any over-drop loses one.
    "ev_stream_dedup" -> QueryDef(
      build = (s, dir) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_sdd_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val ev = Tables.events(s, dir)
        val phases = (0 until 4).map(i =>
          ev.filter(pmod(col("event_id"), lit(4)) === i)) :+
          ev.filter(col("event_id") % 7 === 0) // the replay tail
        // stage sequentially, pinning each file's mtime to its delivery
        // rank (the file source admits oldest-mtime-first)
        var seen = Set.empty[String]
        val base = System.currentTimeMillis()
        phases.zipWithIndex.foreach { case (df, i) =>
          df.coalesce(1).write.mode("append").parquet(s"$root/src")
          val parts = fs.listStatus(
              new org.apache.hadoop.fs.Path(s"$root/src"))
            .filter(_.getPath.getName.startsWith("part-"))
          parts.filterNot(st => seen(st.getPath.getName))
            .foreach(st => fs.setTimes(st.getPath, base + i * 1000L, -1L))
          seen ++= parts.map(_.getPath.getName)
        }
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
        val qn = s"sdd_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.EventStreams
          .dedupEvents(stream, delay = "35 days")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn).groupBy("event_type").agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(floor(col("value") * 100).cast("long")).as("total_cents"))
      },
      oracle = Some(
        """SELECT event_type, count(*) AS n,
          |       count(DISTINCT user_id) AS n_users,
          |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
          |         AS total_cents
          |FROM events GROUP BY event_type""".stripMargin)
    ),

    // LEFT OUTER stream-stream join: click-less purchases must emit a
    // null-match row — but only once the watermark PROVES no future click
    // can arrive for the interval. Two far-future sentinel rows (one per
    // side, different users, staged as the last micro-batch) push both
    // sides' watermarks past every real event, so Spark's no-data batch
    // flushes every outer row deterministically; sentinels filter out of
    // the result and never join (disjoint users). The batch LEFT JOIN
    // replays it — the oracle gate for outer stream-stream semantics.
    "ev_stream_outer_join" -> QueryDef(
      build = (s, dir) => {
        val (stream, root) = sentinelStagedStream(s, dir, "ssoj")
        val qn = s"ssoj_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.EventStreams
          .purchaseClickJoin(stream, deltaSeconds = 14400L,
            joinType = "leftOuter")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        s.table(qn).filter(col("user_id") >= 0).select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          round(col("c_value"), 6).as("click_value"))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
          |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
          |       round(c.value, 6) AS click_value
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON p.user_id = c.user_id
          | AND c.ts >= p.ts - INTERVAL 14400 SECONDS
          | AND c.ts <= p.ts""".stripMargin)
    ),

    // FULL OUTER stream-stream join — completes the family: click-less
    // purchases AND purchase-less clicks both emit null-match rows, each
    // flushed only once the OPPOSITE side's watermark proves no future
    // match can arrive (a click's outer row needs the purchase watermark
    // past c_ts + 4h). The same sentinel pair drives both flushes; the
    // click side keeps its own user id in the output so click-only rows
    // stay identifiable. Batch FULL JOIN replays it exactly.
    "ev_stream_full_join" -> QueryDef(
      build = (s, dir) => {
        val (stream, root) = sentinelStagedStream(s, dir, "ssfj")
        val qn = s"ssfj_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.EventStreams
          .purchaseClickJoin(stream, deltaSeconds = 14400L,
            joinType = "fullOuter")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        s.table(qn)
          .filter(coalesce(col("user_id"), col("c_user_id")) >= 0)
          .select(
            col("event_id"), col("user_id"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            col("c_user_id").as("click_user_id"),
            date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
            round(col("c_value"), 6).as("click_value"))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
          |       c.user_id AS click_user_id,
          |       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
          |       round(c.value, 6) AS click_value
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
          |  ON p.user_id = c.user_id
          | AND c.ts >= p.ts - INTERVAL 14400 SECONDS
          | AND c.ts <= p.ts""".stripMargin)
    ),

    // stream-STATIC broadcast enrich — the most common production join
    // shape: a fact stream decorated from a dimension table with no
    // watermark, no state, no shuffle of the stream (the dim broadcasts
    // into every micro-batch). Four staged micro-batches prove the
    // per-batch join; the batch equi-join replays it exactly.
    "ev_stream_enrich" -> QueryDef(
      build = (s, dir) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_sse_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val ev = Tables.events(s, dir)
        ev.repartition(4).write.mode("overwrite").parquet(s"$root/src")
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment"))
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
        val qn = s"sse_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = stream
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .select(col("event_id"), col("user_id"),
            col("c_mktsegment").as("segment"),
            round(col("value"), 6).as("value"))
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn)
      },
      oracle = Some(
        """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
          |       round(e.value, 6) AS value
          |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin)
    ),

    // LEFT SEMI stream-stream join — the existence filter: purchases that
    // HAD a qualifying click, emitted once on first match (no click
    // payload, so no outer-row watermark dance and no duplicate emission
    // however many clicks match). The batch EXISTS replays it; sentinels
    // stage the stream identically to the outer variants.
    "ev_stream_semi_join" -> QueryDef(
      build = (s, dir) => {
        val (stream, root) = sentinelStagedStream(s, dir, "sssj")
        val qn = s"sssj_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.EventStreams
          .purchaseClickJoin(stream, deltaSeconds = 14400L,
            joinType = "leftSemi")
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        s.table(qn).filter(col("user_id") >= 0).select(
          col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          round(col("value"), 6).as("purchase_value"))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
          |       round(p.value, 6) AS purchase_value
          |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
          |WHERE EXISTS (
          |  SELECT 1 FROM events c
          |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
          |    AND c.ts >= p.ts - INTERVAL 14400 SECONDS
          |    AND c.ts <= p.ts)""".stripMargin)
    ),

    // SCD Type 2: the per-user event stream as validity intervals —
    // valid_from = own ts, valid_to = next change's ts (open end), current
    // flag on the last ([[graft.operators.Scd]]). ONE window shuffle, no
    // self-join; (ts, event_id) ordering is a total order so both engines
    // land identical intervals.
    "ev_scd2" -> QueryDef(
      build = (s, dir) => {
        val iv = graft.operators.Scd.scd2(Tables.events(s, dir),
          keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id")
        iv.select(col("user_id"), col("event_id"), col("event_type"),
          date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          col("is_current").cast("long").as("is_current"))
      },
      oracle = Some(
        """SELECT user_id, event_id, event_type,
          |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
          |       strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
          |       CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)
    ),

    // as-of with attribution window: only clicks within the last hour count
    "ev_asof_tolerance" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
        round6(graft.operators.AsOfJoin
          .asofLeft(purchases, clicks, keyCol = "user_id", tsCol = "ts",
            payloadCols = Seq("value"), tieCol = "event_id",
            toleranceSeconds = Some(3600L))
          .select(col("event_id"), col("user_id"),
            col("right_value").as("click_value")))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       (SELECT round(c.value, 6) FROM events c
          |        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          |          AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
          |        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_value
          |FROM events p WHERE p.event_type = 'purchase'""".stripMargin)
    ),

    // banded range join: clicks within ±10 min of each purchase (same
    // user), binned equi-join — the interval-join primitive, never a
    // cross product ([[graft.operators.RangeJoin]])
    "ev_range_join" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "value")
        val pairs = graft.operators.RangeJoin.byTimestamp(
          purchases, clicks, tsCol = "ts", deltaSeconds = 600L,
          keyCols = Seq("user_id"))
        round6(pairs.groupBy("event_id", "user_id").agg(
          count(lit(1)).as("n_clicks"),
          sum(col("r_value").cast("decimal(18,2)")).cast("double")
            .as("sum_value")))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id, count(*) AS n_clicks,
          |       round(CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_value
          |FROM events p JOIN events c
          |  ON c.user_id = p.user_id
          | AND p.event_type = 'purchase' AND c.event_type = 'click'
          | AND abs(date_diff('microsecond', p.ts, c.ts)) <= 600000000
          |GROUP BY 1, 2""".stripMargin)
    ),

    // forward as-of: each purchase attributed to the NEXT click (earliest
    // click at or after the purchase; first event_id among equal-ts clicks)
    "ev_asof_forward" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
        round6(graft.operators.AsOfJoin
          .asofLeft(purchases, clicks, keyCol = "user_id", tsCol = "ts",
            payloadCols = Seq("value"), tieCol = "event_id",
            direction = "forward")
          .select(col("event_id"), col("user_id"),
            col("right_value").as("click_value")))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       (SELECT round(c.value, 6) FROM events c
          |        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          |          AND c.ts >= p.ts
          |        ORDER BY c.ts ASC, c.event_id ASC LIMIT 1) AS click_value
          |FROM events p WHERE p.event_type = 'purchase'""".stripMargin)
    ),

    // nearest as-of within ±30 min; equal distance prefers the backward row
    "ev_asof_nearest" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
        round6(graft.operators.AsOfJoin
          .asofLeft(purchases, clicks, keyCol = "user_id", tsCol = "ts",
            payloadCols = Seq("value"), tieCol = "event_id",
            toleranceSeconds = Some(1800L), direction = "nearest")
          .select(col("event_id"), col("user_id"),
            col("right_value").as("click_value")))
      },
      oracle = Some(
        """SELECT p.event_id, p.user_id,
          |       (SELECT round(c.value, 6) FROM events c
          |        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          |          AND abs(date_diff('microsecond', p.ts, c.ts)) <= 1800000000
          |        ORDER BY abs(date_diff('microsecond', p.ts, c.ts)) ASC,
          |                 CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END ASC,
          |                 CASE WHEN c.ts <= p.ts THEN -c.event_id ELSE c.event_id END ASC
          |        LIMIT 1) AS click_value
          |FROM events p WHERE p.event_type = 'purchase'""".stripMargin)
    ),

    // JSON point-lookup over the props payload column
    "ev_json_extract" -> QueryDef(
      build = (s, dir) => round6(Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))),
      oracle = Some(
        """SELECT event_type,
          |       count(k) AS n_with_k,
          |       CAST(sum(k) AS BIGINT) AS sum_k,
          |       round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k
          |FROM (SELECT event_type,
          |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |      FROM events) t
          |GROUP BY event_type""".stripMargin)
    ),

    // semi-structured VARIANT path (Spark 4 native): props parses ONCE
    // into the binary variant encoding, then typed variant_get extraction
    // — the scale path for schema-flexible columns, where repeated
    // get_json_object re-parses the string per extraction. The oracle
    // replays through DuckDB's JSON reader (same values, different
    // encoding), so the gate is on semantics, not the binary format.
    "ev_variant_extract" -> QueryDef(
      build = (s, dir) => Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", expr("variant_get(v, '$.k', 'long')"))
        .filter(col("k").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          count_distinct(col("k")).as("n_distinct_k")),
      oracle = Some(
        """SELECT event_type, count(*) AS n,
          |       min(k) AS min_k, max(k) AS max_k,
          |       count(DISTINCT k) AS n_distinct_k
          |FROM (SELECT event_type,
          |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |      FROM events) t
          |WHERE k IS NOT NULL
          |GROUP BY event_type""".stripMargin)
    ),

    // RANGE-frame window: per-user rolling 10-minute event-value sum keyed
    // on the TIME AXIS, not row counts — RANGE includes same-second peers
    // and spans value gaps, which a ROWS frame cannot express. Frame key =
    // integer epoch seconds in both engines; exact cents so the rolling
    // sum is order-independent.
    "ev_window_range_frame" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("sec"))
          .rangeBetween(-600L, 0L)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            unix_seconds(col("ts")).as("sec"),
            floor(col("value") * 100).cast("long").as("cents"))
          .withColumn("roll_cents", sum(col("cents")).over(w))
          .select("event_id", "user_id", "sec", "roll_cents")
      },
      oracle = Some(
        """SELECT event_id, user_id,
          |       date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS sec,
          |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER (
          |         PARTITION BY user_id
          |         ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
          |         RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_cents
          |FROM events""".stripMargin)
    ),

    // sessionization: 30-min inactivity gap via lag + running flag-sum
    // per-user tallies through the two-phase SALTED aggregate — the
    // explicit skew lever for power-law grouping keys ([[graft.operators
    // .Skew.saltedCountSum]]); exact long sums, so the re-combine is
    // bit-identical to the direct aggregation the oracle runs
    "ev_skewed_user_tally" -> QueryDef(
      build = (s, dir) => graft.operators.Skew.saltedCountSum(
        Tables.events(s, dir), keys = Seq("user_id"), valueCol = "event_id",
        salts = 16),
      oracle = Some(
        """SELECT user_id, count(*) AS n,
          |       CAST(sum(event_id) AS BIGINT) AS sum_value
          |FROM events GROUP BY user_id""".stripMargin)
    ),

    // windowFunnel conversion levels (view → click → purchase, 24 h from
    // the first view): greedy earliest-match, ONE shuffle (collect + HOF
    // fold) where the chained-joins formulation pays one pass per step.
    // Oracle replays the equivalent min-chain in SQL.
    "ev_funnel" -> QueryDef(
      build = (s, dir) => graft.operators.Funnel.levels(
          Tables.events(s, dir), entityCol = "user_id", tsCol = "ts",
          typeCol = "event_type", steps = Seq("view", "click", "purchase"),
          windowMicros = 86400L * 1000000L)
        .groupBy("level").agg(count(lit(1)).as("n_users")),
      oracle = Some(
        """WITH base AS (SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events),
          |users AS (SELECT DISTINCT user_id FROM base),
          |u1 AS (SELECT user_id, min(tsu) AS t1 FROM base
          |       WHERE event_type = 'view' GROUP BY 1),
          |u2 AS (SELECT b.user_id, min(b.tsu) AS t2 FROM base b JOIN u1 USING (user_id)
          |       WHERE b.event_type = 'click' AND b.tsu > u1.t1
          |         AND b.tsu <= u1.t1 + 86400000000 GROUP BY 1),
          |u3 AS (SELECT b.user_id, min(b.tsu) AS t3
          |       FROM base b JOIN u1 USING (user_id) JOIN u2 USING (user_id)
          |       WHERE b.event_type = 'purchase' AND b.tsu > u2.t2
          |         AND b.tsu <= u1.t1 + 86400000000 GROUP BY 1)
          |SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
          |                 WHEN t2 IS NOT NULL THEN 2
          |                 WHEN t1 IS NOT NULL THEN 1
          |                 ELSE 0 END AS BIGINT) AS level,
          |       count(*) AS n_users
          |FROM users
          |LEFT JOIN u1 USING (user_id)
          |LEFT JOIN u2 USING (user_id)
          |LEFT JOIN u3 USING (user_id)
          |GROUP BY 1""".stripMargin)
    ),

    // z-score anomaly screen: per event type, how many events sit beyond
    // 3σ of the type's own value distribution. One tiny per-type moment
    // aggregate broadcast back onto the stream — the events table is
    // scanned once and never shuffled on a data-sized key. Both engines
    // compute sample stddev over identical doubles; the strict 3σ
    // comparison sits far from fp noise for continuous values.
    "ev_anomaly" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val stats = ev.groupBy("event_type")
          .agg(avg(col("value")).as("mu"),
            stddev_samp(col("value")).as("sd"))
        ev.join(broadcast(stats), Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(abs(col("value") - col("mu")) > lit(3.0) * col("sd"), 1L)
              .otherwise(0L)).as("n_outliers"))
      },
      oracle = Some(
        """WITH st AS (
          |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
          |  FROM events GROUP BY 1)
          |SELECT e.event_type, count(*) AS n_events,
          |       CAST(sum(CASE WHEN abs(e.value - st.mu) > 3.0 * st.sd
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
          |FROM events e JOIN st USING (event_type)
          |GROUP BY 1""".stripMargin)
    ),

    // cohort retention matrix: users grouped by the epoch-week of their
    // FIRST event; n distinct users active per (cohort_week, week_offset).
    // One per-user min (shuffle), a broadcast join back (first-event dim ≪
    // events), then the distinct+count pair on the cohort grid. Integer
    // epoch-week arithmetic replays identically in SQL.
    "ev_retention" -> QueryDef(
      build = (s, dir) => {
        val wk = 7L * 86400L * 1000000L
        val ev = Tables.events(s, dir)
        val first = ev.groupBy("user_id")
          .agg(min(unix_micros(col("ts"))).as("first_us"))
        ev.select(col("user_id"), unix_micros(col("ts")).as("us"))
          .join(broadcast(first), Seq("user_id"))
          .select(col("user_id"),
            floor(col("first_us") / wk).cast("long").as("cohort_week"),
            (floor(col("us") / wk) - floor(col("first_us") / wk))
              .cast("long").as("week_offset"))
          .distinct()
          .groupBy("cohort_week", "week_offset")
          .agg(count(lit(1)).as("n_active"))
      },
      oracle = Some(
        """WITH f AS (SELECT user_id, min(epoch_us(ts)) AS first_us
          |           FROM events GROUP BY 1),
          |a AS (SELECT DISTINCT e.user_id,
          |             CAST(floor(f.first_us / 604800000000) AS BIGINT) AS cohort_week,
          |             CAST(floor(epoch_us(e.ts) / 604800000000)
          |                  - floor(f.first_us / 604800000000) AS BIGINT) AS week_offset
          |      FROM events e JOIN f USING (user_id))
          |SELECT cohort_week, week_offset, count(*) AS n_active
          |FROM a GROUP BY 1, 2""".stripMargin)
    ),

    // Gap boundary is strict > everywhere (batch lag-gap,
    // session_window, both stateful processors): a successor at EXACTLY
    // the gap CONTINUES the session, matching session_window's
    // merge-contiguous semantics. StreamingSpec pins the batch boundary
    // with an exact-gap fixture.
    "ev_sessions" -> QueryDef(
      build = (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = col("ts").cast("double") -
          lag(col("ts"), 1).over(byUser).cast("double")
        Tables.events(s, dir)
          .withColumn("new_sess",
            when(gap.isNull || gap > 1800.0, 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(
            sum(col("new_sess")).as("n_sessions"),
            count(lit(1)).as("n_events"))
      },
      oracle = Some(
        """WITH flagged AS (
          |  SELECT user_id,
          |         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800.0
          |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |              THEN 1 ELSE 0 END AS new_sess
          |  FROM events
          |)
          |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
          |       count(*) AS n_events
          |FROM flagged GROUP BY user_id""".stripMargin)
    ),

    // streaming session windows, oracle-gated end-to-end (the spec-only
    // →declared promotion, like ev_stream_dedup): the watermarked
    // session_window aggregate in APPEND mode only emits a session once
    // the watermark proves its 30-minute gap can never be bridged — the
    // far-future sentinel batch pushes the watermark past every real
    // event, so the no-data batch flushes ALL real sessions
    // deterministically (sentinel users are negative and filtered).
    // The batch lag-gap sessionization replays it per session in SQL.
    // The oracle's flag is strict > gap: a successor at EXACTLY the gap
    // CONTINUES the session in all three implementations —
    // session_window merges contiguous windows, and both stateful
    // processors continue on delta <= gap to match it —
    // StatefulStreamSpec pins the boundary with an exact-gap fixture.
    "ev_stream_sessions" -> QueryDef(
      build = (s, dir) => {
        val (stream, root) = sentinelStagedStream(s, dir, "sss")
        val qn = s"sss_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.EventStreams.userSessions(stream)
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn).filter(col("user_id") >= 0)
          .select("user_id", "session_start", "n_events")
      },
      oracle = Some(
        """WITH flagged AS (
          |  SELECT user_id, ts,
          |         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts)) > 1800.0
          |              OR lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts) IS NULL
          |              THEN 1 ELSE 0 END AS new_sess
          |  FROM events
          |),
          |sess AS (
          |  SELECT user_id, ts,
          |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
          |           ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM flagged)
          |SELECT user_id,
          |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          |       count(*) AS n_events
          |FROM sess GROUP BY user_id, sid""".stripMargin)
    ),

    // the flatMapGroupsWithState sessionizer, oracle-gated: the custom
    // keyed-state shape session_window can't express (emit-once on
    // close, custom merge rules) must land on the SAME sessions — here
    // with session_end carried too. Sessions close by successor-past-gap
    // or by event-time TIMEOUT when the watermark passes last+gap; the
    // sentinel batch drives every real session through one of the two
    // arms. Same lag-gap SQL replay as ev_stream_sessions plus max(ts).
    "ev_stream_sessions_state" -> QueryDef(
      build = (s, dir) => {
        val (stream, root) = sentinelStagedStream(s, dir, "ssst")
        val qn = s"ssst_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.StatefulStreams
          .timeoutSessions(stream, gapSeconds = 1800L)
          .toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn).filter(col("user_id") >= 0)
          .select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
              .as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss")
              .as("session_end"),
            col("n_events"))
      },
      oracle = Some(
        """WITH flagged AS (
          |  SELECT user_id, ts,
          |         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts)) > 1800.0
          |              OR lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts) IS NULL
          |              THEN 1 ELSE 0 END AS new_sess
          |  FROM events
          |),
          |sess AS (
          |  SELECT user_id, ts,
          |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
          |           ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM flagged)
          |SELECT user_id,
          |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
          |       count(*) AS n_events
          |FROM sess GROUP BY user_id, sid""".stripMargin)
    ),

    // the transformWithState sessionizer (Spark 4's arbitrary-state API:
    // named ValueState + explicit event-time timers on the RocksDB
    // provider) must land on the same sessions again — three
    // implementations of one session algebra (session_window,
    // flatMapGroupsWithState, transformWithState), one SQL oracle. The
    // provider flips to RocksDB for this query and restores after.
    "ev_stream_sessions_tws" -> QueryDef(
      build = (s, dir) => {
        val (stream, root) = sentinelStagedStream(s, dir, "sstw")
        val provKey = "spark.sql.streaming.stateStore.providerClass"
        val prev = s.conf.getOption(provKey)
        s.conf.set(provKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val qn = s"sstw_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.streaming.StatefulStreams
          .twsSessions(stream, gapSeconds = 1800L)
          .toDF()
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally {
          q.stop()
          prev match {
            case Some(v) => s.conf.set(provKey, v)
            case None => s.conf.unset(provKey)
          }
        }
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn).filter(col("user_id") >= 0)
          .select(col("user_id"),
            date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss")
              .as("session_start"),
            date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss")
              .as("session_end"),
            col("n_events"))
      },
      oracle = Some(
        """WITH flagged AS (
          |  SELECT user_id, ts,
          |         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts)) > 1800.0
          |              OR lag(ts) OVER
          |                (PARTITION BY user_id ORDER BY ts) IS NULL
          |              THEN 1 ELSE 0 END AS new_sess
          |  FROM events
          |),
          |sess AS (
          |  SELECT user_id, ts,
          |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
          |           ROWS UNBOUNDED PRECEDING) AS sid
          |  FROM flagged)
          |SELECT user_id,
          |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
          |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
          |       count(*) AS n_events
          |FROM sess GROUP BY user_id, sid""".stripMargin)
    ),

    // sequential pattern mining, the cheap-and-cheerful tier: top-20
    // event-type trigrams over per-user ordered sequences (the 3-step
    // behavioral motifs downstream of the Markov matrix). One window
    // shuffle for the lead chain, one hash agg, TakeOrdered top-k —
    // count-ranked with a string tie-break, so fully deterministic.
    "ev_type_trigrams" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("trigram"))
          .groupBy("trigram").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("trigram")).limit(20)
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT event_type AS a,
          |         lead(event_type, 1) OVER w AS b,
          |         lead(event_type, 2) OVER w AS c
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT a || '>' || b || '>' || c AS trigram, count(*) AS n
          |FROM t WHERE c IS NOT NULL
          |GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20""".stripMargin)
    ),

    // inter-arrival burstiness per user — mean gap + coefficient of
    // variation from EXACT integer sufficient statistics (decimal Σg/Σg²
    // here, HUGEINT in the oracle): the variance numerator is integer-
    // exact and Cauchy-Schwarz-non-negative before any float op; only
    // the final divisions/sqrt are double, on identical operands. One
    // window shuffle + one hash agg.
    "ev_interarrival" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Interarrival.stats(
        Tables.events(s, dir), "user_id", "ts", "event_id")),
      oracle = Some(
        """WITH g AS (
          |  SELECT user_id,
          |         epoch_us(ts) - lag(epoch_us(ts)) OVER
          |           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          |  FROM events),
          |a AS (
          |  SELECT user_id, count(*) AS n_gaps,
          |         sum(CAST(gap AS HUGEINT)) AS sg,
          |         sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS sq
          |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
          |v AS (
          |  SELECT user_id, n_gaps,
          |         CAST(n_gaps * sq - sg * sg AS DOUBLE)
          |           / (CAST(n_gaps AS DOUBLE) * CAST(n_gaps AS DOUBLE)) AS var_pop,
          |         CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_us
          |  FROM a)
          |SELECT user_id, n_gaps,
          |       round(mean_us / 1000000.0, 6) AS mean_gap_s,
          |       round(CASE WHEN mean_us > 0 THEN sqrt(var_pop) / mean_us
          |                  ELSE NULL END, 6) AS cv
          |FROM v""".stripMargin)
    ),

    // peak concurrency: how many sessions (30-min-gap rule, the
    // ev_sessions definition) were simultaneously active at the busiest
    // instant, and when that instant first occurred. Classic interval
    // overlap counting: +1/-1 boundary events, running sum over the
    // GLOBAL time order — executed as the two-phase distributed prefix
    // sum (range-bucketed, driver prefixes ≤512 bucket offsets), NOT the
    // single-partition `sum OVER (ORDER BY t)` window the oracle replays.
    // Boundary frame is checkpointed once (PrefixSum traverses it twice).
    "ev_peak_concurrency" -> QueryDef(
      build = (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gap = col("ts").cast("double") -
          lag(col("ts"), 1).over(byUser).cast("double")
        val sess = Tables.events(s, dir)
          .withColumn("new_sess",
            when(gap.isNull || gap > 1800.0, 1L).otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(byUser))
          .groupBy("user_id", "sess_id")
          .agg(
            unix_micros(min(col("ts")).cast("timestamp")).as("s_us"),
            unix_micros(max(col("ts")).cast("timestamp")).as("e_us"))
        val boundaries = sess.select(col("s_us").as("t"), lit(1L).as("d"))
          .unionAll(sess.select((col("e_us") + 1L).as("t"), lit(-1L).as("d")))
          .groupBy("t").agg(sum(col("d")).as("d"))
          .localCheckpoint(true)
        val cum = graft.operators.PrefixSum.overOrdered(
          boundaries, "t", "d", buckets = 512)
        val peak = cum.agg(max(col("cum")).as("peak"))
        cum.crossJoin(broadcast(peak)).filter(col("cum") === col("peak"))
          .agg(max(col("peak")).as("peak"), min(col("t")).as("peak_t_us"))
      },
      oracle = Some(
        """WITH f AS (
          |  SELECT user_id, event_id, ts,
          |         CASE WHEN epoch(ts) - epoch(lag(ts) OVER uw) > 1800.0
          |              OR lag(ts) OVER uw IS NULL THEN 1 ELSE 0 END AS new_sess
          |  FROM events WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |s0 AS (
          |  SELECT user_id, ts,
          |         sum(new_sess) OVER (PARTITION BY user_id
          |           ORDER BY ts, event_id) AS sess_id
          |  FROM f),
          |s AS (
          |  SELECT user_id, sess_id,
          |         epoch_us(min(ts)) AS s_us, epoch_us(max(ts)) AS e_us
          |  FROM s0 GROUP BY 1, 2),
          |b AS (SELECT s_us AS t, 1 AS d FROM s
          |      UNION ALL SELECT e_us + 1, -1 FROM s),
          |g AS (SELECT t, sum(d) AS d FROM b GROUP BY t),
          |c AS (SELECT t, sum(d) OVER (ORDER BY t) AS cum FROM g)
          |SELECT CAST(max(cum) AS BIGINT) AS peak,
          |       (SELECT min(t) FROM c
          |        WHERE cum = (SELECT max(cum) FROM c)) AS peak_t_us
          |FROM c""".stripMargin)
    ),

    // trailing-K EWMA smoothing of each user's value series, reported at
    // the user's most recent event. The recursive EWMA unrolled via
    // (1-α)^{-i} running sums explodes numerically; the trailing form
    // keeps weights FIXED per lag offset (renormalized over the lags that
    // exist, so short histories stay unbiased) — a pure lag-chain window
    // expression: ONE shuffle on user_id serves both the lag chain and
    // the latest-row pick, all arithmetic whole-stage-codegen'd. Weights
    // are Scala-computed doubles embedded verbatim in the oracle
    // (Double.toString parse roundtrips exactly — the PageRank trick),
    // and both engines left-fold the weighted sum, so the IEEE754 op
    // order is identical.
    "ev_ewma" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
          .select("user_id", "event_id", "ts", "value")
        val sm = graft.operators.Ewma.trailing(
          ev, "user_id", "ts", "event_id", "value", alpha = 0.4, k = 6)
        val last = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        round6(sm.withColumn("_rn", row_number().over(last))
          .filter(col("_rn") === 1)
          .select(col("user_id"), col("value"), col("ewma")))
      },
      oracle = Some {
        val ws = graft.operators.Ewma.weights(0.4, 6)
        def lagJ(j: Int): String =
          if (j == 0) "value" else s"lag(value, $j) OVER w"
        val num = ws.zipWithIndex
          .map { case (w, j) => s"$w * coalesce(${lagJ(j)}, 0.0)" }
          .mkString(" + ")
        val den = ws.zipWithIndex
          .map { case (w, j) =>
            s"$w * (CASE WHEN ${lagJ(j)} IS NOT NULL THEN 1.0 ELSE 0.0 END)"
          }
          .mkString(" + ")
        s"""WITH sm AS (
           |  SELECT user_id, event_id, ts, value,
           |         ($num) / ($den) AS ewma
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
           |)
           |SELECT user_id, round(value, 6) AS value, round(ewma, 6) AS ewma
           |FROM sm
           |QUALIFY row_number() OVER
           |  (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin
      }
    ),

    // per-type autocorrelation of the hourly event-count series at lags
    // 1..3 — the seasonality/self-similarity diagnostic. The series is
    // the GAP-FILLED hourly grid (ACF over a sparse series with silent
    // gaps is wrong — absent hours are zeros, and they carry exactly the
    // anti-correlation signal bursts produce); one window shuffle
    // computes all three lag columns; μ is one division of exact
    // integers, so every deviation product is identical IEEE754 on both
    // engines and only final-sum association noise remains, far under
    // the 6-dp rounding of a ±1-bounded ratio.
    "ev_acf" -> QueryDef(
      build = (s, dir) => {
        val series = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("event_type"),
          bucketMicros = 3600000000L)
        round6(graft.operators.Acf.autocorr(
          series, Seq("event_type"), "bucket_us", "n", maxLag = 3))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 3600000000, 3600000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.event_type, g.bucket_us, coalesce(b.n, 0) AS n
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |mu AS (
          |  SELECT event_type,
          |         CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mu
          |  FROM f GROUP BY 1),
          |d AS (
          |  SELECT f.event_type, f.bucket_us,
          |         CAST(f.n AS DOUBLE) - mu.mu AS dev,
          |         lag(CAST(f.n AS DOUBLE) - mu.mu, 1) OVER w AS dl1,
          |         lag(CAST(f.n AS DOUBLE) - mu.mu, 2) OVER w AS dl2,
          |         lag(CAST(f.n AS DOUBLE) - mu.mu, 3) OVER w AS dl3
          |  FROM f JOIN mu USING (event_type)
          |  WINDOW w AS (PARTITION BY f.event_type ORDER BY f.bucket_us)),
          |a AS (
          |  SELECT event_type, sum(dev * dev) AS den,
          |         sum(dev * dl1) AS num1, count(dl1) AS n1,
          |         sum(dev * dl2) AS num2, count(dl2) AS n2,
          |         sum(dev * dl3) AS num3, count(dl3) AS n3
          |  FROM d GROUP BY 1),
          |u AS (
          |  SELECT event_type, 1 AS lag, n1 AS n_terms,
          |         CASE WHEN den > 0 THEN num1 / den END AS acf FROM a
          |  UNION ALL
          |  SELECT event_type, 2, n2,
          |         CASE WHEN den > 0 THEN num2 / den END FROM a
          |  UNION ALL
          |  SELECT event_type, 3, n3,
          |         CASE WHEN den > 0 THEN num3 / den END FROM a)
          |SELECT event_type, CAST(lag AS INTEGER) AS lag, n_terms,
          |       round(acf, 6) AS acf
          |FROM u""".stripMargin)
    ),

    // MAD-based robust outlier screen per event type — the heavy-tail
    // companion to ev_anomaly's 3σ z-score (outliers inflate mean/stddev
    // enough to mask themselves; median/MAD have breakdown point 0.5).
    // Two passes by construction: the MAD is a median OF deviations from
    // the group median. Both medians are Spark percentile ≡ DuckDB
    // quantile_cont, so every per-row modified z-score is one multiply +
    // one divide of identical doubles on both engines.
    "ev_mad_anomaly" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Robust.madAnomaly(
        Tables.events(s, dir), "event_type", "value", cutoff = 3.5)),
      oracle = Some(
        """WITH med AS (
          |  SELECT event_type,
          |         quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
          |  FROM events WHERE value IS NOT NULL GROUP BY 1),
          |dv AS (
          |  SELECT e.event_type, med.med,
          |         abs(CAST(e.value AS DOUBLE) - med.med) AS dev
          |  FROM events e JOIN med USING (event_type)
          |  WHERE e.value IS NOT NULL),
          |mad AS (
          |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
          |  FROM dv GROUP BY 1)
          |SELECT dv.event_type, count(*) AS n,
          |       round(min(dv.med), 6) AS med,
          |       round(min(mad.mad), 6) AS mad,
          |       CAST(sum(CASE WHEN mad.mad > 0
          |                      AND 0.6745 * dv.dev / mad.mad > 3.5
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          |       round(max(CASE WHEN mad.mad > 0
          |                      THEN 0.6745 * dv.dev / mad.mad END), 6)
          |         AS max_score
          |FROM dv JOIN mad USING (event_type)
          |GROUP BY 1""".stripMargin)
    ),

    // weekly cohort retention triangle — users grouped by first-event
    // week, tracked across subsequent active weeks. One user_id-keyed
    // shuffle feeds both the distinct-activity frame and its first-week
    // re-aggregate; the join is co-partitioned; the triangle is
    // weeks²-sized. Weeks are exact epoch-micros multiples under the
    // UTC session, so the offset is exact integer arithmetic and the
    // single retention division has identical integer operands on both
    // engines.
    "ev_cohort_retention" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Cohort.weeklyRetention(
        Tables.events(s, dir), "user_id", "ts")),
      oracle = Some(
        """WITH active AS (
          |  SELECT user_id AS u, epoch_us(date_trunc('week', ts)) AS week_us
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |  GROUP BY 1, 2),
          |cohort AS (SELECT u, min(week_us) AS cohort_us FROM active GROUP BY 1),
          |tri AS (
          |  SELECT cohort_us,
          |         (week_us - cohort_us) // 604800000000 AS week_offset,
          |         count(*) AS n_active
          |  FROM active JOIN cohort USING (u) GROUP BY 1, 2),
          |sz AS (SELECT cohort_us, n_active AS cohort_size
          |       FROM tri WHERE week_offset = 0)
          |SELECT CAST(make_timestamp(cohort_us) AS DATE) AS cohort_week,
          |       week_offset, n_active,
          |       round(CAST(n_active AS DOUBLE)
          |             / CAST(cohort_size AS DOUBLE), 6) AS retention
          |FROM tri JOIN sz USING (cohort_us)""".stripMargin)
    ),

    // CUSUM mean-shift changepoint per event type over the gap-filled
    // hourly series: max_t |Σ(x_i−μ)| / (σ√n) with the argmax bucket as
    // the estimated shift location. The prefix sum is an EXACT long, so
    // every per-row deviation is derived from exact integers and two
    // shared doubles — zero float accumulation, bit-identical argmax
    // compares on both engines; ties break to the earliest bucket.
    "ev_changepoint" -> QueryDef(
      build = (s, dir) => {
        val series = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("event_type"),
          bucketMicros = 3600000000L)
        round6(graft.operators.Changepoint.cusum(
          series, Seq("event_type"), "bucket_us", "n"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 3600000000, 3600000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.event_type, g.bucket_us, coalesce(b.n, 0) AS n
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |s AS (
          |  SELECT event_type, count(*) AS nb,
          |         CAST(sum(n) AS DOUBLE) / count(*) AS mu,
          |         sqrt(CAST(sum(n * n) AS DOUBLE) / count(*)
          |              - (CAST(sum(n) AS DOUBLE) / count(*))
          |                * (CAST(sum(n) AS DOUBLE) / count(*))) AS sigma
          |  FROM f GROUP BY 1),
          |c AS (
          |  SELECT event_type, bucket_us,
          |         sum(n) OVER (PARTITION BY event_type
          |                      ORDER BY bucket_us) AS cum,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY bucket_us) AS t
          |  FROM f),
          |d AS (
          |  SELECT c.event_type, c.bucket_us,
          |         abs(CAST(c.cum AS DOUBLE)
          |             - CAST(c.t AS DOUBLE) * s.mu) AS dev
          |  FROM c JOIN s USING (event_type)),
          |m AS (SELECT event_type, max(dev) AS maxdev FROM d GROUP BY 1)
          |SELECT s.event_type, s.nb AS n_buckets,
          |       round(s.mu, 6) AS mu, round(s.sigma, 6) AS sigma,
          |       CASE WHEN s.sigma > 0 THEN
          |         round(m.maxdev / (s.sigma * sqrt(CAST(s.nb AS DOUBLE))), 6)
          |       END AS cusum_stat,
          |       CASE WHEN s.sigma > 0 THEN
          |         (SELECT min(d.bucket_us) FROM d
          |          WHERE d.event_type = s.event_type
          |            AND d.dev = m.maxdev)
          |       END AS cp_bucket_us
          |FROM s JOIN m USING (event_type)""".stripMargin)
    ),

    // SLO burn rate: trailing-6h error share of all events, hourly — the
    // SRE error-budget readout. Trailing sums FOLD, so this is ONE
    // ROWS-frame window over the hourly aggregate (hour-cardinality
    // rows, not data-sized; contrast the non-folding distinct in
    // ev_rolling_actives which needs the expansion strategy). Frame is
    // over PRESENT hours — this corpus has no silent hours at this
    // grain; ev_burn_rate_gapped below is the gap-robust composition
    // (Resample gap-fill + PrefixSum, no global window) for feeds where
    // buckets can be empty. Exact integer counts; one division;
    // burn = share/budget against 5%.
    "ev_burn_rate" -> QueryDef(
      build = (s, dir) => {
        val us = unix_micros(col("ts"))
        val hourly = Tables.events(s, dir)
          .groupBy((us - pmod(us, lit(3600000000L))).as("bucket_us"))
          .agg(count(lit(1)).as("total"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("errors"))
        val w = Window.orderBy(col("bucket_us")).rowsBetween(-5, 0)
        round6(hourly
          .withColumn("w_total", sum(col("total")).over(w))
          .withColumn("w_errors", sum(col("errors")).over(w))
          .select(col("bucket_us"), col("w_errors"), col("w_total"),
            (col("w_errors").cast("double") / col("w_total").cast("double"))
              .as("error_share"),
            ((col("w_errors").cast("double") / col("w_total").cast("double"))
              / lit(0.05)).as("burn_rate")))
      },
      oracle = Some(
        """WITH h AS (
          |  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS total,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           AS errors
          |  FROM events GROUP BY 1),
          |r AS (
          |  SELECT bucket_us,
          |         sum(errors) OVER w AS w_errors,
          |         sum(total) OVER w AS w_total
          |  FROM h
          |  WINDOW w AS (ORDER BY bucket_us
          |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
          |SELECT bucket_us, CAST(w_errors AS BIGINT) AS w_errors,
          |       CAST(w_total AS BIGINT) AS w_total,
          |       round(CAST(w_errors AS DOUBLE)
          |             / CAST(w_total AS DOUBLE), 6) AS error_share,
          |       round((CAST(w_errors AS DOUBLE) / CAST(w_total AS DOUBLE))
          |             / 0.05, 6) AS burn_rate
          |FROM r""".stripMargin)
    ),

    // multi-window burn-rate alert (the SRE-workbook pattern): a page
    // fires only when BOTH the fast 1h and slow 6h windows burn above
    // threshold — fast-only is noise, slow-only is stale. Both frames
    // evaluate off ONE window sort over the hourly aggregate; exact
    // integer counts, two divisions per hour.
    "ev_burn_rate_multi" -> QueryDef(
      build = (s, dir) => {
        val us = unix_micros(col("ts"))
        val hourly = Tables.events(s, dir)
          .groupBy((us - pmod(us, lit(3600000000L))).as("bucket_us"))
          .agg(count(lit(1)).as("total"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("errors"))
        val w = Window.orderBy(col("bucket_us"))
        val w6 = w.rowsBetween(-5, 0)
        def burn(e: org.apache.spark.sql.Column,
                 t: org.apache.spark.sql.Column) =
          e.cast("double") / t.cast("double") / lit(0.05)
        round6(hourly
          .withColumn("burn_1h", burn(col("errors"), col("total")))
          .withColumn("burn_6h",
            burn(sum(col("errors")).over(w6), sum(col("total")).over(w6)))
          .select(col("bucket_us"), col("burn_1h"), col("burn_6h"),
            (col("burn_1h") > 1.0 && col("burn_6h") > 1.0)
              .cast("long").as("page")))
      },
      oracle = Some(
        """WITH h AS (
          |  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS total,
          |         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          |           AS errors
          |  FROM events GROUP BY 1),
          |r AS (
          |  SELECT bucket_us,
          |         CAST(errors AS DOUBLE) / total / 0.05 AS burn_1h,
          |         CAST(sum(errors) OVER w AS DOUBLE)
          |           / (sum(total) OVER w) / 0.05 AS burn_6h
          |  FROM h
          |  WINDOW w AS (ORDER BY bucket_us
          |               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
          |SELECT bucket_us, round(burn_1h, 6) AS burn_1h,
          |       round(burn_6h, 6) AS burn_6h,
          |       CAST(burn_1h > 1.0 AND burn_6h > 1.0 AS BIGINT) AS page
          |FROM r""".stripMargin)
    ),

    // gap-robust SLO burn rate: trailing-6h error share at 15-min grain
    // over the SPARSE purchase/error subset (real empty buckets by
    // construction — the grain ev_interpolate picked for the same
    // reason), so the oracle genuinely exercises the gap case. Empty
    // buckets carry zero errors AND zero totals via Resample's dense
    // grid instead of being skipped by a present-rows frame. The
    // trailing sum is cum(i) − cum(i−24) on the regular grid: two
    // PrefixSum.overOrdered passes (range-bucketed two-phase cumsum —
    // NO single-partition global window) + one shifted equi-join,
    // which is the shape that survives a years-of-minutes grid.
    "ev_burn_rate_gapped" -> QueryDef(
      build = (s, dir) => {
        val step = 900000000L // 15 min; trailing 6h = 24 buckets
        val base = Tables.events(s, dir)
          .filter(col("ts").isNotNull &&
            col("event_type").isin("purchase", "error"))
        val grid = graft.operators.Resample.gapFilledCounts(
          base, tsCol = "ts", keyCols = Seq.empty, bucketMicros = step)
        val us = unix_micros(col("ts"))
        val errs = base.filter(col("event_type") === "error")
          .groupBy((us - pmod(us, lit(step))).as("bucket_us"))
          .agg(count(lit(1)).as("ne"))
        val f = grid.join(errs, Seq("bucket_us"), "left")
          .withColumn("ne", coalesce(col("ne"), lit(0L)))
        val cum = graft.operators.PrefixSum
          .overOrdered(graft.operators.PrefixSum.overOrdered(f, "bucket_us", "n")
            .withColumnRenamed("cum", "_cumT"), "bucket_us", "ne")
          .withColumnRenamed("cum", "_cumE")
          .localCheckpoint(true) // feeds both sides of the shift join
        val shifted = cum.select(
          (col("bucket_us") + lit(24L * step)).as("bucket_us"),
          col("_cumT").as("_cumT6"), col("_cumE").as("_cumE6"))
        val share =
          col("w_errors").cast("double") / col("w_total").cast("double")
        cum.join(shifted, Seq("bucket_us"), "left")
          .withColumn("w_total",
            col("_cumT") - coalesce(col("_cumT6"), lit(0L)))
          .withColumn("w_errors",
            col("_cumE") - coalesce(col("_cumE6"), lit(0L)))
          .select(col("bucket_us"), col("w_errors"), col("w_total"),
            when(col("w_total") > 0, round(share, 6)).as("error_share"),
            when(col("w_total") > 0, round(share / lit(0.05), 6))
              .as("burn_rate"))
      },
      oracle = Some(
        """WITH base AS (
          |  SELECT epoch_us(ts) - (epoch_us(ts) % 900000000) AS b,
          |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS e
          |  FROM events
          |  WHERE ts IS NOT NULL AND event_type IN ('purchase', 'error')),
          |sp AS (SELECT b, count(*) AS n, sum(e) AS ne
          |       FROM base GROUP BY 1),
          |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM sp),
          |grid AS (SELECT unnest(range(lo, hi + 900000000, 900000000))
          |           AS bucket_us FROM bounds),
          |f AS (SELECT g.bucket_us, coalesce(sp.n, 0) AS n,
          |             coalesce(sp.ne, 0) AS ne
          |      FROM grid g LEFT JOIN sp ON g.bucket_us = sp.b),
          |r AS (SELECT bucket_us,
          |             CAST(sum(ne) OVER w AS BIGINT) AS w_errors,
          |             CAST(sum(n) OVER w AS BIGINT) AS w_total
          |      FROM f
          |      WINDOW w AS (ORDER BY bucket_us
          |                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
          |SELECT bucket_us, w_errors, w_total,
          |       CASE WHEN w_total > 0 THEN
          |         round(CAST(w_errors AS DOUBLE)
          |               / CAST(w_total AS DOUBLE), 6) END AS error_share,
          |       CASE WHEN w_total > 0 THEN
          |         round(CAST(w_errors AS DOUBLE) / CAST(w_total AS DOUBLE)
          |               / 0.05, 6) END AS burn_rate
          |FROM r""".stripMargin)
    ),

    // Hampel despike: rolling ±5h median/MAD outlier screen per type —
    // the LOCAL robust filter (ev_mad_anomaly's global median masks
    // nothing-near-a-level-shift; the rolling window adapts). No sliding
    // window function: rows expand map-side to the 2k+1 centers they
    // serve, two (type, center)-keyed percentile aggregates.
    "ev_hampel" -> QueryDef(
      build = (s, dir) => {
        val series = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("event_type"),
          bucketMicros = 3600000000L)
        round6(graft.operators.Hampel.filter(
          series, Seq("event_type"), "bucket_us", "n",
          stepMicros = 3600000000L, k = 5, cutoff = 3.5))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 3600000000, 3600000000)) AS bucket_us
          |  FROM bounds),
          |x AS (
          |  SELECT g.event_type, g.bucket_us,
          |         CAST(coalesce(b.n, 0) AS DOUBLE) AS v
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |off AS (SELECT unnest(range(-5, 6)) AS o),
          |contrib AS (
          |  SELECT event_type, bucket_us + o * 3600000000 AS c, v
          |  FROM x, off),
          |med AS (SELECT event_type, c, quantile_cont(v, 0.5) AS rmed
          |        FROM contrib GROUP BY 1, 2),
          |mad AS (
          |  SELECT contrib.event_type, contrib.c,
          |         quantile_cont(abs(v - rmed), 0.5) AS rmad,
          |         min(rmed) AS rmed
          |  FROM contrib JOIN med ON contrib.event_type = med.event_type
          |                       AND contrib.c = med.c
          |  GROUP BY 1, 2),
          |sc AS (
          |  SELECT x.event_type, x.bucket_us, mad.rmad,
          |         0.6745 * abs(x.v - mad.rmed) / mad.rmad AS score
          |  FROM x JOIN mad ON x.event_type = mad.event_type
          |                 AND x.bucket_us = mad.c)
          |SELECT event_type, count(*) AS n_buckets,
          |       CAST(sum(CASE WHEN rmad > 0 AND score > 3.5
          |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
          |       round(max(CASE WHEN rmad > 0 THEN score END), 6)
          |         AS max_score,
          |       min(CASE WHEN rmad > 0 AND score > 3.5 THEN bucket_us END)
          |         AS first_flagged_us
          |FROM sc GROUP BY 1""".stripMargin)
    ),

    // OHLC resample bars — open/high/low/close of value per (type, hour):
    // the candlestick downsample every metrics store ships. Open/close
    // are lexicographic struct min/max on the (ts, event_id) total order
    // (no window, no sort — ONE hash aggregate); high/low plain min/max;
    // raw stored doubles pass through untouched, so no float care at all.
    // ts IS NOT NULL on BOTH engines: Spark sorts NULLS FIRST, DuckDB
    // NULLS LAST, so a null ts would silently flip the open/close picks.
    "ev_ohlc" -> QueryDef(
      build = (s, dir) => round6(Tables.events(s, dir)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .groupBy(col("event_type"),
          (unix_micros(col("ts")) -
            pmod(unix_micros(col("ts")), lit(3600000000L))).as("bucket_us"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(struct(col("ts"), col("event_id"), col("value")))
            .getField("value").as("close"),
          count(lit(1)).as("n"))),
      oracle = Some(
        """SELECT event_type,
          |       epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |       round(first(value ORDER BY ts, event_id), 6) AS open,
          |       round(max(value), 6) AS high,
          |       round(min(value), 6) AS low,
          |       round(last(value ORDER BY ts, event_id), 6) AS close,
          |       count(*) AS n
          |FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
          |GROUP BY 1, 2""".stripMargin)
    ),

    // seasonally-adjusted anomaly screen: residual z-score against the
    // hour-of-day profile — catches the 3am spike that IS anomalous for
    // 3am but invisible to the raw z-score (ev_anomaly), and clears the
    // 6pm peak the raw screen falsely flags. Phase means + residual σ
    // from the same exact integer sufficient statistics as
    // ev_seasonality; the phase-mean join is a keys×24 broadcast.
    "ev_seasonal_anomaly" -> QueryDef(
      build = (s, dir) => {
        val series = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("event_type"),
          bucketMicros = 3600000000L)
        val phase = pmod(expr("bucket_us div 3600000000L"), lit(24L))
        val perPhase = series.groupBy(col("event_type"), phase.as("_p"))
          .agg(count(lit(1)).as("_np"), sum(col("n")).as("_sp"),
            sum(col("n") * col("n")).as("_sxxp"))
        val sigma = perPhase.groupBy("event_type")
          .agg(sum(col("_np")).as("_nb"), sum(col("_sxxp")).as("_sxx"),
            sum(col("_sp").cast("double") * col("_sp").cast("double") /
              col("_np").cast("double")).as("_expl"))
          .select(col("event_type"), col("_nb"),
            sqrt((col("_sxx").cast("double") - col("_expl")) /
              col("_nb").cast("double")).as("_sig"))
        val means = perPhase.select(col("event_type"), col("_p"),
          (col("_sp").cast("double") / col("_np").cast("double")).as("_mu"))
        val z = abs(col("n").cast("double") - col("_mu")) / col("_sig")
        round6(series.withColumn("_p", phase)
          .join(broadcast(means), Seq("event_type", "_p"))
          .join(broadcast(sigma), "event_type")
          .groupBy("event_type")
          .agg(
            max(col("_nb")).as("n_buckets"),
            max(col("_sig")).as("sigma_resid"),
            sum(when(col("_sig") > 0 && z > 3.0, 1L).otherwise(0L))
              .as("n_flagged"),
            max(when(col("_sig") > 0, z)).as("max_z"),
            min(when(col("_sig") > 0 && z > 3.0, col("bucket_us")))
              .as("first_flagged_us")))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 3600000000, 3600000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.event_type, g.bucket_us,
          |         (g.bucket_us // 3600000000) % 24 AS p,
          |         coalesce(b.n, 0) AS n
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |pp AS (
          |  SELECT event_type, p, count(*) AS np, sum(n) AS sp,
          |         sum(n * n) AS sxxp
          |  FROM f GROUP BY 1, 2),
          |sg AS (
          |  SELECT event_type, sum(np) AS nb,
          |         sqrt((CAST(sum(sxxp) AS DOUBLE)
          |               - sum(CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
          |                     / CAST(np AS DOUBLE)))
          |              / CAST(sum(np) AS DOUBLE)) AS sig
          |  FROM pp GROUP BY 1),
          |mm AS (SELECT event_type, p,
          |              CAST(sp AS DOUBLE) / CAST(np AS DOUBLE) AS mu
          |       FROM pp),
          |j AS (
          |  SELECT f.event_type, f.bucket_us,
          |         abs(CAST(f.n AS DOUBLE) - mm.mu) / sg.sig AS z,
          |         sg.sig, sg.nb
          |  FROM f JOIN mm ON f.event_type = mm.event_type AND f.p = mm.p
          |         JOIN sg ON f.event_type = sg.event_type)
          |SELECT event_type, CAST(max(nb) AS BIGINT) AS n_buckets,
          |       round(max(sig), 6) AS sigma_resid,
          |       CAST(sum(CASE WHEN sig > 0 AND z > 3.0 THEN 1 ELSE 0 END)
          |            AS BIGINT) AS n_flagged,
          |       round(max(CASE WHEN sig > 0 THEN z END), 6) AS max_z,
          |       min(CASE WHEN sig > 0 AND z > 3.0 THEN bucket_us END)
          |         AS first_flagged_us
          |FROM j GROUP BY 1""".stripMargin)
    ),

    // segmented means around the CUSUM changepoint — the "what actually
    // changed" readout on top of ev_changepoint: per type, the mean
    // level before vs after the detected shift bucket and the delta.
    // Composition of two oracled pieces; conditional aggregates over the
    // same gap-filled grid, exact integer sums, two divisions per type.
    "ev_level_shift" -> QueryDef(
      build = (s, dir) => {
        val series = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("event_type"),
          bucketMicros = 3600000000L)
        val cp = graft.operators.Changepoint.cusum(
          series, Seq("event_type"), "bucket_us", "n")
          .filter(col("cp_bucket_us").isNotNull)
          .select(col("event_type"), col("cp_bucket_us"))
        round6(series.join(broadcast(cp), "event_type")
          .groupBy("event_type")
          .agg(
            max(col("cp_bucket_us")).as("cp_bucket_us"),
            (sum(when(col("bucket_us") <= col("cp_bucket_us"), col("n")))
              .cast("double") /
              sum(when(col("bucket_us") <= col("cp_bucket_us"), 1L))
                .cast("double")).as("mu_before"),
            (sum(when(col("bucket_us") > col("cp_bucket_us"), col("n")))
              .cast("double") /
              sum(when(col("bucket_us") > col("cp_bucket_us"), 1L))
                .cast("double")).as("mu_after"))
          .withColumn("shift", col("mu_after") - col("mu_before")))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 3600000000, 3600000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.event_type, g.bucket_us, coalesce(b.n, 0) AS n
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |s AS (
          |  SELECT event_type, count(*) AS nb,
          |         CAST(sum(n) AS DOUBLE) / count(*) AS mu,
          |         sqrt(CAST(sum(n * n) AS DOUBLE) / count(*)
          |              - (CAST(sum(n) AS DOUBLE) / count(*))
          |                * (CAST(sum(n) AS DOUBLE) / count(*))) AS sigma
          |  FROM f GROUP BY 1),
          |c AS (
          |  SELECT event_type, bucket_us,
          |         sum(n) OVER (PARTITION BY event_type
          |                      ORDER BY bucket_us) AS cum,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY bucket_us) AS t
          |  FROM f),
          |d AS (
          |  SELECT c.event_type, c.bucket_us,
          |         abs(CAST(c.cum AS DOUBLE)
          |             - CAST(c.t AS DOUBLE) * s.mu) AS dev
          |  FROM c JOIN s USING (event_type)),
          |m AS (SELECT event_type, max(dev) AS maxdev FROM d GROUP BY 1),
          |cp AS (
          |  SELECT s.event_type,
          |         (SELECT min(d.bucket_us) FROM d
          |          WHERE d.event_type = s.event_type
          |            AND d.dev = m.maxdev) AS cp_bucket_us
          |  FROM s JOIN m USING (event_type)
          |  WHERE s.sigma > 0)
          |SELECT f.event_type, max(cp.cp_bucket_us) AS cp_bucket_us,
          |       round(CAST(sum(CASE WHEN f.bucket_us <= cp.cp_bucket_us
          |                           THEN f.n END) AS DOUBLE)
          |         / CAST(sum(CASE WHEN f.bucket_us <= cp.cp_bucket_us
          |                         THEN 1 END) AS DOUBLE), 6) AS mu_before,
          |       round(CAST(sum(CASE WHEN f.bucket_us > cp.cp_bucket_us
          |                           THEN f.n END) AS DOUBLE)
          |         / CAST(sum(CASE WHEN f.bucket_us > cp.cp_bucket_us
          |                         THEN 1 END) AS DOUBLE), 6) AS mu_after,
          |       round(CAST(sum(CASE WHEN f.bucket_us > cp.cp_bucket_us
          |                           THEN f.n END) AS DOUBLE)
          |         / CAST(sum(CASE WHEN f.bucket_us > cp.cp_bucket_us
          |                         THEN 1 END) AS DOUBLE)
          |         - CAST(sum(CASE WHEN f.bucket_us <= cp.cp_bucket_us
          |                         THEN f.n END) AS DOUBLE)
          |         / CAST(sum(CASE WHEN f.bucket_us <= cp.cp_bucket_us
          |                         THEN 1 END) AS DOUBLE), 6) AS shift
          |FROM f JOIN cp ON f.event_type = cp.event_type
          |GROUP BY 1""".stripMargin)
    ),

    // lead-lag cross-correlation between the hourly click series and the
    // hourly purchase series at lags −3..+3 — "do clicks lead
    // purchases?". No window anywhere: the lag dimension folds into the
    // equi-join key (y's bucket shifted by k·step), so at scale this is
    // a bucket-keyed hash join instead of a single-partition series
    // window. Full-series means/norms from exact integer sums.
    "ev_ccf" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        def hourly(t: String) = graft.operators.Resample.gapFilledCounts(
          ev.filter(col("event_type") === t), tsCol = "ts",
          keyCols = Seq.empty, bucketMicros = 3600000000L)
        round6(graft.operators.Acf.crosscorr(
          hourly("click"), hourly("purchase"),
          orderCol = "bucket_us", valueCol = "n",
          stepMicros = 3600000000L, maxLag = 3))
      },
      oracle = Some(
        """WITH bx AS (
          |  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS b,
          |         count(*) AS n
          |  FROM events WHERE event_type = 'click' GROUP BY 1),
          |gx AS (SELECT unnest(range((SELECT min(b) FROM bx),
          |         (SELECT max(b) FROM bx) + 3600000000, 3600000000)) AS b),
          |fx AS (SELECT g.b, CAST(coalesce(bx.n, 0) AS DOUBLE) AS v
          |       FROM gx g LEFT JOIN bx USING (b)),
          |by AS (
          |  SELECT epoch_us(ts) - (epoch_us(ts) % 3600000000) AS b,
          |         count(*) AS n
          |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
          |gy AS (SELECT unnest(range((SELECT min(b) FROM by),
          |         (SELECT max(b) FROM by) + 3600000000, 3600000000)) AS b),
          |fy AS (SELECT g.b, CAST(coalesce(by.n, 0) AS DOUBLE) AS v
          |       FROM gy g LEFT JOIN by USING (b)),
          |sx AS (SELECT sum(v) / count(*) AS mx, sum(v * v) AS sxx,
          |              count(*) AS nx FROM fx),
          |sy AS (SELECT sum(v) / count(*) AS my, sum(v * v) AS syy,
          |              count(*) AS ny FROM fy),
          |lags AS (SELECT unnest(range(-3, 4)) AS lag),
          |j AS (SELECT l.lag, fx.v AS xv, fy.v AS yv
          |      FROM lags l
          |      CROSS JOIN fy
          |      JOIN fx ON fx.b = fy.b - l.lag * 3600000000)
          |SELECT lag, count(*) AS n_terms,
          |       CASE WHEN sxx - CAST(nx AS DOUBLE) * mx * mx > 0
          |             AND syy - CAST(ny AS DOUBLE) * my * my > 0 THEN
          |         round(sum((xv - mx) * (yv - my))
          |           / sqrt((sxx - CAST(nx AS DOUBLE) * mx * mx)
          |                  * (syy - CAST(ny AS DOUBLE) * my * my)), 6)
          |       END AS ccf
          |FROM j, sx, sy
          |GROUP BY lag, mx, sxx, nx, my, syy, ny""".stripMargin)
    ),

    // Kaplan-Meier signup→purchase conversion curve, right-censored at
    // each user's last activity — the estimator that keeps the
    // not-yet-converted users a naive mean drops. One user-keyed
    // shuffle; the KM table + its ordered window are duration-sized.
    // Survival = exp(Σ ln(1−d/n)) summed in duration order — sequential
    // and bit-identical on both engines; a risk-set-exhausting row pins
    // survival to exact 0 instead of ln(0).
    "ev_survival" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Survival.kaplanMeier(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        originType = "signup", targetType = "purchase",
        stepMicros = 3600000000L)),
      oracle = Some(
        """WITH base AS (
          |  SELECT user_id AS s, epoch_us(ts) AS us, event_type AS t
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |orig AS (SELECT s, min(us) AS t0 FROM base
          |         WHERE t = 'signup' GROUP BY 1),
          |subj AS (
          |  SELECT b.s,
          |         min(CASE WHEN b.t = 'purchase' AND b.us >= o.t0
          |                  THEN b.us END) AS tt,
          |         max(b.us) AS tend, min(o.t0) AS t0
          |  FROM base b JOIN orig o USING (s) GROUP BY 1),
          |dur AS (
          |  SELECT CASE WHEN tt IS NOT NULL THEN (tt - t0) // 3600000000
          |              ELSE (tend - t0) // 3600000000 END AS duration,
          |         CASE WHEN tt IS NOT NULL THEN 1 ELSE 0 END AS e
          |  FROM subj),
          |tbl AS (SELECT duration, sum(e) AS n_events,
          |               count(*) - sum(e) AS n_censored
          |        FROM dur GROUP BY 1),
          |tot AS (SELECT count(*) AS n_total FROM dur),
          |km AS (
          |  SELECT duration, n_events, n_censored,
          |         n_total - sum(n_events + n_censored) OVER w
          |           + n_events + n_censored AS n_risk
          |  FROM tbl, tot
          |  WINDOW w AS (ORDER BY duration ROWS UNBOUNDED PRECEDING)),
          |km2 AS (
          |  SELECT *,
          |         CASE WHEN n_events < n_risk THEN
          |           ln(1.0 - CAST(n_events AS DOUBLE)
          |                    / CAST(n_risk AS DOUBLE)) END AS term,
          |         max(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END)
          |           OVER w2 AS zero
          |  FROM km
          |  WINDOW w2 AS (ORDER BY duration ROWS UNBOUNDED PRECEDING))
          |SELECT duration, CAST(n_risk AS BIGINT) AS n_risk,
          |       CAST(n_events AS BIGINT) AS n_events,
          |       CAST(n_censored AS BIGINT) AS n_censored,
          |       round(CASE WHEN zero = 1 THEN 0.0
          |                  ELSE exp(sum(term) OVER w3) END, 6) AS survival
          |FROM km2
          |WINDOW w3 AS (ORDER BY duration ROWS UNBOUNDED PRECEDING)
          |QUALIFY n_events > 0""".stripMargin)
    ),

    // rolling 24h distinct active users reported hourly — distinct
    // doesn't fold, so the set-union semantics are materialized as a
    // bounded k-fold expansion of distinct (user, hour) pairs into the
    // report hours each is visible in, then re-distinct'd. No window
    // function, no data-sized state; shuffles keyed on (user, bucket).
    "ev_rolling_actives" -> QueryDef(
      build = (s, dir) => round6(graft.operators.RollingDistinct
        .trailingDistinct(Tables.events(s, dir), "user_id", "ts",
          stepMicros = 3600000000L, windowBuckets = 24)),
      oracle = Some(
        """WITH pairs AS (
          |  SELECT DISTINCT user_id AS e,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS b
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |bounds AS (SELECT min(b) AS lo, max(b) AS hi FROM pairs),
          |x AS (SELECT e, unnest(range(b,
          |        least(b + 82800000000, hi) + 3600000000,
          |        3600000000)) AS bucket_us
          |      FROM pairs, bounds),
          |d AS (SELECT DISTINCT e, bucket_us FROM x)
          |SELECT bucket_us, count(*) AS n_distinct
          |FROM d GROUP BY 1""".stripMargin),
      headline = true
    ),

    // the 100 TB path for rolling actives: per-bucket DataSketches HLL
    // sketches (hll_sketch_agg, codegen'd built-in), expanded to the
    // trailing window and hll_union_agg-merged — state per report bucket
    // is ~KB of registers instead of the exact twin's id set. No oracle
    // (sketch layouts are engine-specific); the build SELF-GATES
    // LOUDLY: assert_true errors the whole job if ANY bucket's estimate
    // strays beyond 5% of the exact ev_rolling_actives count computed
    // in the same job — a partial accuracy regression cannot ship as a
    // silently-shorter result.
    "ev_rolling_actives_approx" -> QueryDef(
      build = (s, dir) => {
        val step = 3600000000L
        val us = unix_micros(col("ts"))
        val pairs = Tables.events(s, dir)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), (us - pmod(us, lit(step))).as("_b"))
        val sk = pairs.groupBy("_b")
          .agg(expr("hll_sketch_agg(user_id, 14)").as("_sk"))
          .localCheckpoint(true)
        val bounds = sk.agg(max("_b").as("_hi"))
        val approx = sk.crossJoin(broadcast(bounds))
          .select(explode(sequence(col("_b"),
            least(col("_b") + lit(23L * step), col("_hi")),
            lit(step))).as("bucket_us"), col("_sk"))
          .groupBy("bucket_us")
          .agg(expr("hll_sketch_estimate(hll_union_agg(_sk, true))")
            .as("n_approx"))
        val exact = graft.operators.RollingDistinct.trailingDistinct(
          Tables.events(s, dir), "user_id", "ts", step, 24)
        approx.join(exact, "bucket_us")
          .withColumn("_gate", assert_true(
            abs(col("n_approx").cast("double") -
              col("n_distinct").cast("double")) <=
              lit(0.05) * col("n_distinct").cast("double"),
            concat(lit("HLL estimate beyond 5% of exact at bucket "),
              col("bucket_us"))))
          .filter(col("_gate").isNull)
          .select(col("bucket_us"), col("n_approx"), col("n_distinct"))
      },
      oracle = None,
      selfGated = true
    ),

    // hour-of-day seasonality strength per event type over the
    // gap-filled hourly grid: 1 − Var(resid)/Var(total) with the
    // per-hour mean as the seasonal component (the R² of the one-hot
    // phase regression), plus the peak hour. Reduces entirely to exact
    // integer sufficient statistics via Σ(x−μ_p)² = Σx² − Σ_p s_p²/n_p —
    // no per-row float pass, ≤24 float divisions per type.
    "ev_seasonality" -> QueryDef(
      build = (s, dir) => {
        val series = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts", keyCols = Seq("event_type"),
          bucketMicros = 3600000000L)
        round6(graft.operators.Seasonality.profileStrength(
          series, Seq("event_type"), "bucket_us", "n",
          stepMicros = 3600000000L, cycleLen = 24))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 3600000000) AS bucket_us,
          |         count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 3600000000, 3600000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.event_type, g.bucket_us, coalesce(b.n, 0) AS n
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |pp AS (
          |  SELECT event_type, (bucket_us // 3600000000) % 24 AS p,
          |         count(*) AS np, sum(n) AS sp, sum(n * n) AS sxxp
          |  FROM f GROUP BY 1, 2),
          |r AS (
          |  SELECT event_type, sum(np) AS n_buckets, sum(sp) AS sx,
          |         sum(sxxp) AS sxx,
          |         sum(CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
          |             / CAST(np AS DOUBLE)) AS explained
          |  FROM pp GROUP BY 1),
          |pm AS (SELECT event_type, p,
          |              CAST(sp AS DOUBLE) / CAST(np AS DOUBLE) AS m
          |       FROM pp),
          |mx AS (SELECT event_type, max(m) AS mm FROM pm GROUP BY 1),
          |peak AS (SELECT pm.event_type, min(pm.p) AS peak_phase,
          |                min(mx.mm) AS peak_mean
          |         FROM pm JOIN mx ON pm.event_type = mx.event_type
          |                        AND pm.m = mx.mm
          |         GROUP BY 1)
          |SELECT r.event_type, CAST(r.n_buckets AS BIGINT) AS n_buckets,
          |       round(CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE), 6)
          |         AS mu,
          |       CASE WHEN CAST(sxx AS DOUBLE)
          |                 - CAST(n_buckets AS DOUBLE)
          |                   * (CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE))
          |                   * (CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE))
          |                 > 0 THEN
          |         round(1.0 - (CAST(sxx AS DOUBLE) - explained)
          |           / (CAST(sxx AS DOUBLE)
          |              - CAST(n_buckets AS DOUBLE)
          |                * (CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE))
          |                * (CAST(sx AS DOUBLE) / CAST(n_buckets AS DOUBLE))), 6)
          |       END AS strength,
          |       peak.peak_phase, round(peak.peak_mean, 6) AS peak_mean
          |FROM r JOIN peak ON r.event_type = peak.event_type""".stripMargin)
    ),

    // session entry→exit path matrix: 30-min-gap sessionization (the
    // ev_sessions definition), each session's first and last event type
    // via lexicographic struct min/max on the (ts, event_id) total
    // order, counted per (entry, exit) pair — the "where do journeys
    // start and end" product-analytics staple. One user-keyed window
    // shuffle + two hash aggs; no data-sized join.
    "ev_entry_exit" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val us = unix_micros(col("ts"))
        val gap = us - lag(us, 1).over(w)
        // ts IS NOT NULL on BOTH engines: Spark orders NULLS FIRST,
        // DuckDB NULLS LAST — a null ts would flip entry/exit picks.
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .withColumn("_new",
            when(gap.isNull || gap > 1800000000L, 1L).otherwise(0L))
          .withColumn("_sess", sum(col("_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "_sess")
          .agg(
            min(struct(col("ts"), col("event_id"), col("event_type")))
              .getField("event_type").as("entry_type"),
            max(struct(col("ts"), col("event_id"), col("event_type")))
              .getField("event_type").as("exit_type"))
          .groupBy("entry_type", "exit_type")
          .agg(count(lit(1)).as("n_sessions"))
      },
      oracle = Some(
        """WITH e AS (
          |  SELECT user_id, ts, event_id, event_type,
          |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
          |               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
          |                  > 1800000000
          |              THEN 1 ELSE 0 END AS new_sess
          |  FROM events WHERE ts IS NOT NULL
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |s AS (SELECT *, sum(new_sess) OVER
          |        (PARTITION BY user_id ORDER BY ts, event_id
          |         ROWS UNBOUNDED PRECEDING) AS sess
          |      FROM e),
          |fl AS (
          |  SELECT user_id, sess,
          |         first(event_type ORDER BY ts, event_id) AS entry_type,
          |         last(event_type ORDER BY ts, event_id) AS exit_type
          |  FROM s GROUP BY 1, 2)
          |SELECT entry_type, exit_type, count(*) AS n_sessions
          |FROM fl GROUP BY 1, 2""".stripMargin)
    ),

    // Welch's unequal-variance t between every event-type pair on value —
    // the experimentation readout; exact decimal(18,4) sufficient
    // statistics, then a short double chain replayed op-for-op. The
    // statistic is reported, not a p-value (erf is library-specific).
    "ev_welch_t" -> QueryDef(
      build = (s, dir) => round6(graft.operators.StatTests.welchPairs(
        Tables.events(s, dir), "event_type", "value")),
      oracle = Some(
        """WITH g AS (
          |  SELECT event_type, count(*) AS n,
          |         sum(CAST(value AS DECIMAL(18,4))) AS sx,
          |         sum(CAST(value AS DECIMAL(18,4))
          |             * CAST(value AS DECIMAL(18,4))) AS sxx
          |  FROM events
          |  WHERE value IS NOT NULL AND event_type IS NOT NULL
          |  GROUP BY 1 HAVING count(*) >= 2),
          |p AS (
          |  SELECT a.event_type AS g1, b.event_type AS g2,
          |         a.n AS n1, b.n AS n2,
          |         CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean1,
          |         CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE) AS mean2,
          |         (CAST(a.sxx AS DOUBLE)
          |          - CAST(a.n AS DOUBLE)
          |            * (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE))
          |            * (CAST(a.sx AS DOUBLE) / CAST(a.n AS DOUBLE)))
          |           / (CAST(a.n AS DOUBLE) - 1.0)
          |           / CAST(a.n AS DOUBLE) AS se1,
          |         (CAST(b.sxx AS DOUBLE)
          |          - CAST(b.n AS DOUBLE)
          |            * (CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE))
          |            * (CAST(b.sx AS DOUBLE) / CAST(b.n AS DOUBLE)))
          |           / (CAST(b.n AS DOUBLE) - 1.0)
          |           / CAST(b.n AS DOUBLE) AS se2
          |  FROM g a JOIN g b ON a.event_type < b.event_type)
          |SELECT g1, g2, n1, n2, round(mean1, 6) AS mean1,
          |       round(mean2, 6) AS mean2,
          |       CASE WHEN se1 + se2 > 0 THEN
          |         round((mean1 - mean2) / sqrt(se1 + se2), 6) END AS t_stat,
          |       CASE WHEN se1 + se2 > 0 THEN
          |         round((se1 + se2) * (se1 + se2)
          |           / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
          |              + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)), 6)
          |       END AS dof
          |FROM p""".stripMargin)
    ),

    // two-proportion z-test between hash-split arms (user_id parity) on
    // the user-level "ever purchased" outcome, with 95% Wilson score
    // intervals per arm — exact integer counts, a dozen float ops on
    // identical operands, Wilson chosen over Wald for small-n sanity.
    "ev_ab_test" -> QueryDef(
      build = (s, dir) => {
        val subj = Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .groupBy(col("user_id"))
          .agg(max((col("event_type") === "purchase").cast("int"))
            .as("converted"))
          .withColumn("arm",
            concat(lit("arm"), pmod(col("user_id"), lit(2L)).cast("string")))
        round6(graft.operators.StatTests.twoProportionZ(
          subj, "arm", "converted"))
      },
      oracle = Some(
        """WITH subj AS (
          |  SELECT user_id,
          |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |           AS converted,
          |         'arm' || CAST(user_id % 2 AS VARCHAR) AS arm
          |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
          |arms AS (SELECT arm, count(*) AS n, sum(converted) AS conv
          |         FROM subj GROUP BY 1),
          |wp AS (SELECT arm, n, conv,
          |              CAST(conv AS DOUBLE) / CAST(n AS DOUBLE) AS p
          |       FROM arms),
          |j AS (
          |  SELECT a.arm AS arm1, a.n AS n1, a.conv AS conv1, a.p AS p1,
          |         b.arm AS arm2, b.n AS n2, b.conv AS conv2, b.p AS p2,
          |         CAST(a.n AS DOUBLE) AS n1d, CAST(b.n AS DOUBLE) AS n2d,
          |         CAST(a.conv + b.conv AS DOUBLE)
          |           / (CAST(a.n AS DOUBLE) + CAST(b.n AS DOUBLE)) AS pp,
          |         1.959963984540054 * 1.959963984540054 AS zz,
          |         1.959963984540054 AS z
          |  FROM wp a JOIN wp b ON a.arm < b.arm)
          |SELECT arm1, arm2, n1, CAST(conv1 AS BIGINT) AS conv1,
          |       n2, CAST(conv2 AS BIGINT) AS conv2,
          |       round(p1, 6) AS p1, round(p2, 6) AS p2,
          |       CASE WHEN sqrt(pp * (1.0 - pp) * (1.0 / n1d + 1.0 / n2d))
          |                 > 0 THEN
          |         round((p1 - p2)
          |           / sqrt(pp * (1.0 - pp) * (1.0 / n1d + 1.0 / n2d)), 6)
          |       END AS z_stat,
          |       round((p1 + zz / (2.0 * n1d) + -1.0 * (z * sqrt(
          |           p1 * (1.0 - p1) / n1d + zz / (4.0 * n1d * n1d))))
          |         / (1.0 + zz / n1d), 6) AS p1_lo,
          |       round((p1 + zz / (2.0 * n1d) + 1.0 * (z * sqrt(
          |           p1 * (1.0 - p1) / n1d + zz / (4.0 * n1d * n1d))))
          |         / (1.0 + zz / n1d), 6) AS p1_hi,
          |       round((p2 + zz / (2.0 * n2d) + -1.0 * (z * sqrt(
          |           p2 * (1.0 - p2) / n2d + zz / (4.0 * n2d * n2d))))
          |         / (1.0 + zz / n2d), 6) AS p2_lo,
          |       round((p2 + zz / (2.0 * n2d) + 1.0 * (z * sqrt(
          |           p2 * (1.0 - p2) / n2d + zz / (4.0 * n2d * n2d))))
          |         / (1.0 + zz / n2d), 6) AS p2_hi
          |FROM j""".stripMargin)
    ),

    // linear-interpolation gap fill over sparse 15-min mean-value series
    // (purchase/error types — sparse at this grain by construction):
    // interior gaps interpolate between nearest present neighbors,
    // edges stay null. ONE window shuffle serves both the backward and
    // forward neighbor frames off the same sort; the weight divides
    // exact integer micros. Midpoint fills of 2-dp means land EXACTLY on
    // 6-dp halves, where Spark's BigDecimal HALF_UP and DuckDB's float
    // round disagree — so the value ships as integer micro-units through
    // an explicit floor(v·1e6 + 0.5) chain, bit-deterministic on both
    // engines given the bit-identical v.
    "ev_interpolate" -> QueryDef(
      build = (s, dir) => {
        val step = 900000000L
        val us = unix_micros(col("ts"))
        val sparse = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "error"))
          .groupBy(col("event_type"),
            (us - pmod(us, lit(step))).as("bucket_us"))
          .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
            count(lit(1))).as("v"))
        graft.operators.Resample.interpolate(
          sparse, Seq("event_type"), "bucket_us", "v", step)
          .select(col("event_type"), col("bucket_us"),
            floor(col("v") * lit(1000000.0) + lit(0.5)).cast("long")
              .as("v_micro"),
            col("is_interpolated"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT event_type,
          |         epoch_us(ts) - (epoch_us(ts) % 900000000) AS bucket_us,
          |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
          |           / count(*) AS v
          |  FROM events WHERE event_type IN ('purchase', 'error')
          |  GROUP BY 1, 2),
          |bounds AS (
          |  SELECT event_type, min(bucket_us) AS lo, max(bucket_us) AS hi
          |  FROM b GROUP BY 1),
          |grid AS (
          |  SELECT event_type,
          |         unnest(range(lo, hi + 900000000, 900000000)) AS bucket_us
          |  FROM bounds),
          |f AS (
          |  SELECT g.event_type, g.bucket_us, b.v
          |  FROM grid g LEFT JOIN b ON g.event_type = b.event_type
          |                         AND g.bucket_us = b.bucket_us),
          |x AS (
          |  SELECT event_type, bucket_us, v,
          |         last_value(v IGNORE NULLS) OVER wb AS pv,
          |         last_value(CASE WHEN v IS NOT NULL THEN bucket_us END
          |                    IGNORE NULLS) OVER wb AS pb,
          |         first_value(v IGNORE NULLS) OVER wf AS nv,
          |         first_value(CASE WHEN v IS NOT NULL THEN bucket_us END
          |                     IGNORE NULLS) OVER wf AS nb
          |  FROM f
          |  WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_us
          |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |         wf AS (PARTITION BY event_type ORDER BY bucket_us
          |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
          |SELECT event_type, bucket_us,
          |       CAST(floor((CASE WHEN v IS NOT NULL THEN v
          |                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
          |                    pv + (nv - pv)
          |                      * (CAST(bucket_us - pb AS DOUBLE)
          |                         / CAST(nb - pb AS DOUBLE))
          |             END) * 1000000.0 + 0.5) AS BIGINT) AS v_micro,
          |       (v IS NULL AND pv IS NOT NULL AND nv IS NOT NULL)
          |         AS is_interpolated
          |FROM x""".stripMargin)
    ),

    // linear multi-touch attribution: each purchase splits one unit of
    // credit equally over the same user's clicks in the trailing hour
    // (pseudo-channel = click's props.k mod 4 — the data ships no
    // channel dim). The pair space comes from the banded RangeJoin
    // (equi-join on (user, time-bin), never a time-theta join); credit
    // 1/k divides small exact integers; per-channel sums carry only
    // association noise under 6-dp.
    "ev_multitouch" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("props"))
        val pairs = graft.operators.RangeJoin
          .byTimestamp(purchases, clicks, "ts",
            deltaSeconds = 3600, keyCols = Seq("user_id"))
          .filter(col("r_ts") <= col("ts"))
        val perPurchase = Window.partitionBy("event_id")
        round6(pairs
          .withColumn("w", lit(1.0) / count(lit(1)).over(perPurchase))
          .withColumn("channel", concat(lit("ch"),
            pmod(get_json_object(col("r_props"), "$.k").cast("long"),
              lit(4L)).cast("string")))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_touches"),
            sum(col("w")).as("attributed")))
      },
      oracle = Some(
        """WITH p AS (SELECT event_id, user_id, ts FROM events
          |           WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, ts, props FROM events
          |      WHERE event_type = 'click'),
          |pairs AS (
          |  SELECT p.event_id,
          |         'ch' || CAST(CAST(json_extract_string(c.props, '$.k')
          |                  AS BIGINT) % 4 AS VARCHAR) AS channel
          |  FROM p JOIN c ON p.user_id = c.user_id
          |   AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 0 AND 3600000000),
          |w AS (
          |  SELECT channel,
          |         CAST(1.0 AS DOUBLE)
          |           / count(*) OVER (PARTITION BY event_id) AS w
          |  FROM pairs)
          |SELECT channel, count(*) AS n_touches,
          |       round(sum(w), 6) AS attributed
          |FROM w GROUP BY 1""".stripMargin)
    ),

    // conversion-time distribution for converters (signup → first
    // purchase): exact interpolated median/p90 over exact integer-micros
    // durations — the KM curve's companion readout for the users who DID
    // convert. One user-keyed shuffle; single-row output.
    "ev_conversion_time" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        val us = unix_micros(col("ts"))
        val t0 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(us).as("_t0"))
        val durations = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), us.as("_us"))
          .join(t0, "user_id")
          .filter(col("_us") >= col("_t0"))
          .groupBy("user_id").agg(min(col("_us") - col("_t0")).as("_d"))
        round6(durations.agg(
          count(lit(1)).as("n_converted"),
          (percentile(col("_d"), lit(0.5)) / lit(3600000000.0)).as("p50_h"),
          (percentile(col("_d"), lit(0.9)) / lit(3600000000.0)).as("p90_h"),
          (sum(col("_d")).cast("double") / count(lit(1)) /
            lit(3600000000.0)).as("mean_h")))
      },
      oracle = Some(
        """WITH t0 AS (
          |  SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
          |  WHERE event_type = 'signup' AND user_id IS NOT NULL
          |  GROUP BY 1),
          |d AS (
          |  SELECT e.user_id, min(epoch_us(e.ts) - t0.t0) AS d
          |  FROM events e JOIN t0 USING (user_id)
          |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= t0.t0
          |  GROUP BY 1)
          |SELECT count(*) AS n_converted,
          |       round(quantile_cont(d, 0.5) / 3600000000.0, 6) AS p50_h,
          |       round(quantile_cont(d, 0.9) / 3600000000.0, 6) AS p90_h,
          |       round(CAST(sum(d) AS DOUBLE) / count(*) / 3600000000.0, 6)
          |         AS mean_h
          |FROM d""".stripMargin)
    )
  )
}
