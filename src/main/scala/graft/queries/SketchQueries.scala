package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.{CountMin, Hll}

/** Oracled mergeable-sketch queries — the md5-deterministic sketches
  * ([[graft.functions.CountMin]], [[graft.functions.Hll]]) whose every cell
  * and register replays bit-for-bit in DuckDB, closing the gap the built-in
  * sketches leave (`approx_count_distinct`'s xxHash64 + bias tables are
  * engine-private, so `rel_approx_distinct` can only be rows-only).
  */
object SketchQueries {

  private val CmD = 4
  private val CmW = 512

  val defs: Map[String, QueryDef] = Map(

    // point-frequency estimates from ONE fixed-size Count-Min pass: the
    // sketch aggregates map-side into d·w = 2048 longs (no per-key shuffle),
    // then every distinct user's estimate probes the collected sketch as a
    // literal — min over its d cells, always ≥ the exact count. The oracle
    // rebuilds the identical cells from exact group counts (cell total =
    // Σ colliding keys' counts; addition commutes), so estimates hash-match.
    "ev_countmin_freq" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        val key = col("user_id").cast("string")
        val cm = udaf(new CountMin(CmD, CmW))
        // bounded collect: the sketch is d·w = 2048 longs by construction,
        // independent of data size
        val sketch = ev.agg(cm(key).as("sk")).head.getSeq[Long](0)
        ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
          .select(col("user_id"), col("n_exact"),
            CountMin.estimateCol(sketch, CmD, CmW,
              col("user_id").cast("string")).as("n_est"))
      },
      oracle = Some {
        val rows = (0 until CmD).map(i =>
          s"SELECT key, n, $i AS i, ${CountMin.cellSql("key", i, CmW)} AS cell FROM c")
          .mkString("\n  UNION ALL ")
        s"""WITH c AS (
           |  SELECT user_id, CAST(user_id AS VARCHAR) AS key, count(*) AS n
           |  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2),
           |h AS (
           |  $rows
           |),
           |cells AS (SELECT i, cell, sum(n) AS cn FROM h GROUP BY 1, 2),
           |est AS (
           |  SELECT h.key, min(cn) AS est
           |  FROM h JOIN cells USING (i, cell) GROUP BY 1)
           |SELECT c.user_id, CAST(c.n AS BIGINT) AS n_exact,
           |       CAST(est.est AS BIGINT) AS n_est
           |FROM c JOIN est ON c.key = est.key""".stripMargin
      }
    ),

    // per-group approx COUNT DISTINCT via the deterministic 64-register
    // HLL Aggregator — merge is element-wise max, shuffled state is 64 ints
    // per group regardless of key cardinality. The oracle regrows the same
    // registers (max rho per index over a 64-slot grid, absent slots = 0)
    // and applies the identical exact-integer harmonic sum, so the ESTIMATE
    // itself hash-matches, not just a tolerance band.
    "ev_hll_distinct" -> QueryDef(
      build = (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        val hll = udaf(new Hll)
        QueryDef.round6(
          ev.groupBy("event_type")
            .agg(countDistinct(col("user_id")).as("n_exact"),
              hll(col("user_id").cast("string")).as("n_est")))
      },
      oracle = Some {
        val reg = Hll.estimateSql("reg", "event_type")
        s"""WITH k AS (
           |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS key
           |  FROM events WHERE user_id IS NOT NULL),
           |r0 AS (
           |  SELECT event_type, ${Hll.idxSql("key")} AS idx,
           |         max(${Hll.rhoSql("key")}) AS mj
           |  FROM k GROUP BY 1, 2),
           |grid AS (
           |  SELECT event_type, unnest(range(0, ${Hll.M})) AS idx
           |  FROM (SELECT DISTINCT event_type FROM k)),
           |reg AS (
           |  SELECT grid.event_type, grid.idx, coalesce(r0.mj, 0) AS mj
           |  FROM grid LEFT JOIN r0
           |    ON grid.event_type = r0.event_type AND grid.idx = r0.idx),
           |$reg,
           |exact AS (
           |  SELECT event_type, count(DISTINCT user_id) AS n_exact
           |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
           |SELECT exact.event_type, CAST(exact.n_exact AS BIGINT) AS n_exact,
           |       round(est.n_est, 6) AS n_est
           |FROM exact JOIN est ON exact.event_type = est.event_type""".stripMargin
      },
      headline = true
    ),

    // Holt's linear-trend forecast over gap-filled hourly counts — the
    // level+trend member of the time-series family (EWMA = trendless,
    // Theil-Sen = robust slope). The fold is pure ordered +/-/* so the
    // recursive-CTE oracle replays it BIT-exactly (complements spelled
    // 1.0-α on both sides — a pre-folded 0.7 literal can round
    // differently from 1-0.3); state is series-length-sized (calendar-
    // bounded), never row-count-sized.
    "ev_holt_forecast" -> QueryDef(
      build = (s, dir) => {
        val dense = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts",
          keyCols = Seq("event_type"), bucketMicros = 3600000000L)
        val holt = udaf(new graft.functions.HoltSmooth(0.3, 0.1))
        dense.groupBy("event_type")
          .agg(holt(col("bucket_us"), col("n")).as("fit"))
          .select(col("event_type"),
            col("fit.n_buckets").as("n_buckets"),
            round(col("fit.level"), 6).as("level"),
            round(col("fit.trend"), 6).as("trend"),
            round(col("fit.level") + col("fit.trend"), 6).as("forecast_1"),
            round(col("fit.level") + lit(6.0) * col("fit.trend"), 6)
              .as("forecast_6"))
      },
      oracle = Some(
        """WITH RECURSIVE b AS (
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
          |o AS (
          |  SELECT event_type, n,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY bucket_us) AS t
          |  FROM f),
          |mx AS (SELECT event_type, max(t) AS mt FROM o GROUP BY 1),
          |it(event_type, t, l, bb) AS (
          |  SELECT event_type, 1, CAST(n AS DOUBLE), CAST(0 AS DOUBLE)
          |  FROM o WHERE t = 1
          |  UNION ALL
          |  SELECT o.event_type, o.t,
          |         CAST(0.3 AS DOUBLE) * o.n
          |           + (1.0 - CAST(0.3 AS DOUBLE)) * (it.l + it.bb),
          |         CAST(0.1 AS DOUBLE)
          |           * ((CAST(0.3 AS DOUBLE) * o.n
          |               + (1.0 - CAST(0.3 AS DOUBLE)) * (it.l + it.bb))
          |              - it.l)
          |           + (1.0 - CAST(0.1 AS DOUBLE)) * it.bb
          |  FROM it JOIN o ON o.event_type = it.event_type
          |                AND o.t = it.t + 1
          |)
          |SELECT it.event_type, CAST(mx.mt AS BIGINT) AS n_buckets,
          |       round(l, 6) AS level, round(bb, 6) AS trend,
          |       round(l + bb, 6) AS forecast_1,
          |       round(l + 6.0 * bb, 6) AS forecast_6
          |FROM it JOIN mx ON it.event_type = mx.event_type
          |               AND it.t = mx.mt""".stripMargin)
    ),

    // rolling-origin BACKTEST of the same forecaster — the eval harness
    // next to the fit (sim_recall_eval's role for the ANN family): at
    // every step, (l+b) is the one-step-ahead forecast of the incoming
    // bucket, so MAE/RMSE accumulate inside the SAME fold at zero extra
    // passes; the recursive-CTE oracle carries the two residual sums
    // through the identical recursion, bit-for-bit.
    "ev_holt_backtest" -> QueryDef(
      build = (s, dir) => {
        val dense = graft.operators.Resample.gapFilledCounts(
          Tables.events(s, dir), tsCol = "ts",
          keyCols = Seq("event_type"), bucketMicros = 3600000000L)
        val holt = udaf(new graft.functions.HoltSmooth(0.3, 0.1))
        dense.groupBy("event_type")
          .agg(holt(col("bucket_us"), col("n")).as("fit"))
          .select(col("event_type"),
            col("fit.n_buckets").as("n_buckets"),
            round(col("fit.sae") /
              nullif((col("fit.n_buckets") - 1).cast("double"), lit(0.0)), 6)
              .as("mae"),
            round(sqrt(col("fit.se2") /
              nullif((col("fit.n_buckets") - 1).cast("double"), lit(0.0))), 6)
              .as("rmse"))
      },
      oracle = Some(
        """WITH RECURSIVE b AS (
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
          |o AS (
          |  SELECT event_type, n,
          |         row_number() OVER (PARTITION BY event_type
          |                            ORDER BY bucket_us) AS t
          |  FROM f),
          |mx AS (SELECT event_type, max(t) AS mt FROM o GROUP BY 1),
          |it(event_type, t, l, bb, sae, se2) AS (
          |  SELECT event_type, 1, CAST(n AS DOUBLE), CAST(0 AS DOUBLE),
          |         CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
          |  FROM o WHERE t = 1
          |  UNION ALL
          |  SELECT o.event_type, o.t,
          |         CAST(0.3 AS DOUBLE) * o.n
          |           + (1.0 - CAST(0.3 AS DOUBLE)) * (it.l + it.bb),
          |         CAST(0.1 AS DOUBLE)
          |           * ((CAST(0.3 AS DOUBLE) * o.n
          |               + (1.0 - CAST(0.3 AS DOUBLE)) * (it.l + it.bb))
          |              - it.l)
          |           + (1.0 - CAST(0.1 AS DOUBLE)) * it.bb,
          |         it.sae + abs(CAST(o.n AS DOUBLE) - (it.l + it.bb)),
          |         it.se2 + (CAST(o.n AS DOUBLE) - (it.l + it.bb))
          |                  * (CAST(o.n AS DOUBLE) - (it.l + it.bb))
          |  FROM it JOIN o ON o.event_type = it.event_type
          |                AND o.t = it.t + 1
          |)
          |SELECT it.event_type, CAST(mx.mt AS BIGINT) AS n_buckets,
          |       round(sae / nullif(CAST(mx.mt - 1 AS DOUBLE), 0.0), 6)
          |         AS mae,
          |       round(sqrt(se2 / nullif(CAST(mx.mt - 1 AS DOUBLE), 0.0)), 6)
          |         AS rmse
          |FROM it JOIN mx ON it.event_type = mx.event_type
          |               AND it.t = mx.mt""".stripMargin)
    ),

    // STREAMING sketch maintenance: the same HLL Aggregator under a
    // complete-mode streaming aggregate across 4 staged micro-batches.
    // Because merge is element-wise max (commutative, idempotent,
    // order-free), the final streamed registers are BIT-IDENTICAL to the
    // batch sketch no matter how the stream was batched — so the batch
    // oracle gates the streaming path exactly, with no tolerance band.
    // This is the production shape for always-on distinct-user counters:
    // state per group is 64 ints forever, regardless of key cardinality.
    "ev_stream_hll" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_shll_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        ev.repartition(4).write.mode("overwrite").parquet(s"$root/src")
        val hll = udaf(new Hll)
        val stream = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
        val qn = s"shll_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = stream.filter(col("user_id").isNotNull)
          .groupBy("event_type")
          .agg(hll(col("user_id").cast("string")).as("n_est"))
          .writeStream.outputMode("complete")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn).select(col("event_type"), round(col("n_est"), 6).as("n_est"))
      },
      oracle = Some {
        val reg = Hll.estimateSql("reg", "event_type")
        s"""WITH k AS (
           |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS key
           |  FROM events WHERE user_id IS NOT NULL),
           |r0 AS (
           |  SELECT event_type, ${Hll.idxSql("key")} AS idx,
           |         max(${Hll.rhoSql("key")}) AS mj
           |  FROM k GROUP BY 1, 2),
           |grid AS (
           |  SELECT event_type, unnest(range(0, ${Hll.M})) AS idx
           |  FROM (SELECT DISTINCT event_type FROM k)),
           |reg AS (
           |  SELECT grid.event_type, grid.idx, coalesce(r0.mj, 0) AS mj
           |  FROM grid LEFT JOIN r0
           |    ON grid.event_type = r0.event_type AND grid.idx = r0.idx),
           |$reg
           |SELECT event_type, round(n_est, 6) AS n_est FROM est""".stripMargin
      }
    )
  )
}
