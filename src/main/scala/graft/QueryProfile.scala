package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.execution.FormattedMode

/** Dev measurement tool (guide §1): run ONE declared query end-to-end
  * through the noop sink and print a per-Spark-job wall breakdown — job id,
  * duration, task count, and the first line of the callsite — plus the gap
  * time no job covers (driver-side work: planning, tx-log I/O, file
  * listing). The bench medians say WHICH query is slow; this says WHERE
  * inside its build the time goes.
  *
  * `sbt "runMain graft.QueryProfile <query> [sfDir] [reps]"`
  */
object QueryProfile {

  private final case class JobRow(id: Int, start: Long, var end: Long,
                                  var tasks: Int, site: String)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("corpus_clean")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.builder("query-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs(e.jobId) = JobRow(e.jobId, e.time, e.time, 0, site)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        jobs.find { case (_, r) => e.taskInfo.launchTime >= r.start }
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute task counts via the last job whose window covers the stage
          val sid = e.stageInfo.submissionTime.getOrElse(0L)
          jobs.values.toSeq.reverse.find(r => sid >= r.start)
            .foreach(_.tasks += e.stageInfo.numTasks)
        }
    }

    val fn = SparkEntry.queries(name)
    // warm-up (codegen, page cache) — profile the steady state the bench times
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    println(f"===PROFILE $name reps=$reps wall=${wall}%.3f s (${wall / reps}%.3f s/run)")
    val rows = jobs.synchronized(jobs.values.toSeq.sortBy(_.start))
    var covered = 0L
    var lastEnd = 0L
    rows.foreach { r =>
      val dur = r.end - r.start
      covered += math.max(0L, dur - math.max(0L, lastEnd - r.start))
      lastEnd = math.max(lastEnd, r.end)
      println(f"job ${r.id}%4d ${dur / 1000.0}%7.3f s  tasks=${r.tasks}%4d  ${r.site}")
    }
    println(f"jobs=${rows.size} covered=${covered / 1000.0}%.3f s  " +
      f"gaps(driver)=${wall - covered / 1000.0}%.3f s")
    // aggregate by callsite: the per-step cost table
    println("--- by callsite ---")
    rows.groupBy(_.site).toSeq
      .map { case (s, rs) => (s, rs.map(r => r.end - r.start).sum, rs.size) }
      .sortBy(-_._2)
      .foreach { case (s, ms, n) => println(f"${ms / 1000.0}%8.3f s  n=$n%3d  $s") }
    spark.stop()
  }
}
