package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line for the driver.
  *
  * Each query is forced through a noop sink (full column materialization —
  * `count()` would let Catalyst prune the expensive projections). One cheap
  * warmup action first so JVM/codegen warmup isn't billed to the first
  * query.
  *
  * Each query runs SPARK_GRAFT_BENCH_ITERS times (default 3); the reported
  * per-query number and the total are MEDIANS, with per-query relative
  * spread ((max-min)/median) alongside — a single sample at sf0.1 swings
  * ±15-30% run to run, which is wider than most real regressions.
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

    val results = SparkEntry.headlines.toSeq.sortBy(_._1).map { case (name, fn) =>
      val samples = (1 to iters).map { _ =>
        System.gc() // don't bill the previous run's garbage to this one
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
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
