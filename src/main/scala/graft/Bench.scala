package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line for the driver.
  *
  * Each query is forced through a noop sink (full column materialization —
  * `count()` would let Catalyst prune the expensive projections). One cheap
  * warmup action first so JVM/codegen warmup isn't billed to the first
  * query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.orders(spark, sfDir).count() // warmup: JVM + parquet reader

    val results = SparkEntry.headlines.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc() // don't bill the previous query's garbage to this one
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results
      .map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // failures surface IN the JSON line, not just stderr — a broken query
    // must never read as a fast success
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
