package graft

import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: print ONE declared query's formatted physical plan (the
  * single-query sibling of [[PlansDump]], for plan iteration loops):
  * `sbt "runMain graft.ScratchPlan <query> [sfDir]"`.
  */
object ScratchPlan {
  def main(a: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch-plan").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = a.headOption.getOrElse("corpus_clean")
    val sfDir = a.lift(1).getOrElse("/root/testdata/sf0.01")
    val p = SparkEntry.all(name).build(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    println("===PLAN " + name)
    println(p)
    spark.stop()
  }
}
