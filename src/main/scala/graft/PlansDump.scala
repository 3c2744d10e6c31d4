package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.FormattedMode

/** Regenerates PLANS.md: formatted physical plan of every headline query at
  * sf0.01. Run after plan-shape changes so the artifact matches the code:
  * `sbt "runMain graft.PlansDump"`.
  *
  * Args 3+ select an explicit query list instead of the headline set —
  * the plan-inspection loop for a new operator:
  * `sbt "runMain graft.PlansDump /root/testdata/sf0.01 /tmp/p.md text_pii_stats"`.
  */
object PlansDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("PLANS.md")
    val only = args.drop(2).toSet
    val spark = GraftSession.builder("graft-plans").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append("Generated at sf0.01 by `graft.PlansDump`. What to look for: ")
    sb.append("`PushedFilters`/`ReadSchema`\nat scans, `BroadcastHashJoin` ")
    sb.append("for dims, `WholeStageCodegen` spans,\nsingle aggregate ")
    sb.append("exchange in the fused gold plan.\n")
    SparkEntry.all.toSeq.sortBy(_._1).collect {
      case (name, d) if (only.isEmpty && d.headline) || only(name) =>
        val plan = d.build(spark, sfDir).queryExecution
          .explainString(FormattedMode)
        sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
