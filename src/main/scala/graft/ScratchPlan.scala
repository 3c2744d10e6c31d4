import org.apache.spark.sql.execution.FormattedMode
object ScratchPlan {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("scratch-plan").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = a.headOption.getOrElse("corpus_clean")
    val p = graft.SparkEntry.all(name).build(spark, "/root/testdata/sf0.01")
      .queryExecution.explainString(FormattedMode)
    println("===PLAN " + name)
    println(p)
    spark.stop()
  }
}
