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
                                  var tasks: Int, site: String,
                                  stages: mutable.Map[Int, String] =
                                    mutable.LinkedHashMap.empty)

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
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("?")
        val row = JobRow(e.jobId, e.time, e.time, 0, site)
        e.stageInfos.foreach(si => row.stages(si.stageId) = "")
        jobs(e.jobId) = row
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        jobs.values.find(_.stages.contains(e.stageId)).foreach { r =>
          val m = e.taskMetrics
          if (m != null) {
            val prev = r.stages.getOrElse(e.stageId, "")
            val extra = f"[run=${m.executorRunTime / 1000.0}%.2fs " +
              f"cpu=${m.executorCpuTime / 1e9}%.2fs " +
              f"deser=${m.executorDeserializeTime / 1000.0}%.2fs " +
              f"gc=${m.jvmGCTime / 1000.0}%.2fs " +
              f"sw=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%.1fMB " +
              f"sr=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%.1fMB]"
            r.stages(e.stageId) = prev + " " + extra
          }
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          val dur = (for {
            s <- e.stageInfo.submissionTime; c <- e.stageInfo.completionTime
          } yield c - s).getOrElse(0L)
          jobs.values.find(_.stages.contains(e.stageInfo.stageId)).foreach { r =>
            r.tasks += e.stageInfo.numTasks
            r.stages(e.stageInfo.stageId) =
              f"${dur / 1000.0}%.2fs x${e.stageInfo.numTasks} " +
                e.stageInfo.name.takeWhile(_ != '\n').take(60) +
                r.stages.getOrElse(e.stageInfo.stageId, "")
          }
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
      if (dur >= 500)
        r.stages.values.filter(_.nonEmpty).foreach(s =>
          println(s"      stage ${s.take(400)}"))
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
