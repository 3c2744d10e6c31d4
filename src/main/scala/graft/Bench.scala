package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line for the driver.
  *
  * Each query is forced through a noop sink (full column materialization —
  * `count()` would let Catalyst prune the expensive projections). One cheap
  * warmup action first so JVM/codegen warmup isn't billed to the first
  * query.
  *
  * Each query runs one UNTIMED warm-up first (whole-stage codegen + plan
  * compilation land there, not in sample 1 — with only 3 samples a 2-3×
  * first-iteration outlier swamped the spread and masked real ±20%
  * regressions), then SPARK_GRAFT_BENCH_ITERS timed samples (default 3);
  * the reported per-query number and the total are MEDIANS, with
  * per-query relative spread ((max-min)/median) alongside. Sub-second
  * queries execute several times per sample (sized from the warm-up
  * timing, elapsed/reps reported): fixed driver-scheduling jitter is
  * ~100 ms per execution, which IS the spread of a 0.3 s query unless
  * amortized.
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    require(iters >= 1, "SPARK_GRAFT_BENCH_ITERS must be >= 1")
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.orders(spark, sfDir).count() // warmup: JVM + parquet reader

    // optional subset (comma-separated headline names) — for one-off runs
    // like the sf1 scaling measurement, where timing all 20 headlines
    // against a 10x corpus would burn an hour for 5 numbers
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      // subset runs may name ANY declared query (scaling measurements of
      // non-headline ops included); the driver's no-env path stays
      // headlines-only
      case Some(names) => SparkEntry.queries.view.filterKeys(names).toMap
      case None => SparkEntry.headlines
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def run(): Boolean =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      // untimed warm-up: codegen/plan-compile + page-cache priming; its
      // duration sizes the per-sample repetition count for small queries
      val w0 = System.nanoTime()
      run()
      val wEst = (System.nanoTime() - w0) / 1e9
      val reps = math.min(8, math.max(1,
        math.ceil(1.6 / math.max(wEst, 0.05)).toInt))
      val samples = (1 to iters).map { _ =>
        System.gc() // don't bill the previous run's garbage to this one
        val t0 = System.nanoTime()
        val ok = (1 to reps).forall(_ => run())
        ((System.nanoTime() - t0) / 1e9 / reps, ok)
      }
      val times = samples.map(_._1)
      (name, median(times), (times.max - times.min) / median(times),
        samples.forall(_._2))
    }
    val qs = results
      .map { case (k, v, _, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val spread = results
      .map { case (k, _, s, _) => "\"" + k + f"\":$s%.3f" }
      .mkString("{", ",", "}")
    // failures surface IN the JSON line, not just stderr — a broken query
    // must never read as a fast success
    val errs = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"iters":$iters,"spread":$spread,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
