package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Worker main for [[ConcurrentWriterSpec]]: a REAL separate JVM that
  * appends `n` one-row commits to a shared table root through the
  * optimistic-concurrency retry loop. Exercises the cross-process half
  * of the commit protocol (exists-check + rename-without-overwrite on
  * the store) that the JVM-local root lock cannot cover.
  */
object ConcurrentAppendWorker {
  def main(args: Array[String]): Unit = {
    val Array(root, tag, nStr) = args
    val spark = GraftSession.builder(s"xproc-$tag", cores = 2).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      import spark.implicits._
      val vt = VersionedTable(spark, root)
      (1 to nStr.toInt).foreach { i =>
        vt.appendRetrying(Seq((tag, i)).toDF("writer", "seq"),
          maxAttempts = 40)
      }
    } finally spark.stop()
    sys.exit(0) // don't let stray non-daemon threads hang the process
  }
}

/** Cross-PROCESS concurrent-writer evidence: two forked JVMs (not two
  * threads — the in-process root lock is bypassed by construction)
  * racing appends against one table root. Every append must land
  * exactly once, the version ledger must be dense, and in-commit
  * timestamps must stay strictly monotonic across processes.
  */
class ConcurrentWriterSpec extends SparkSpec {

  private val appendsPerWriter = 6

  test("two real JVMs appending to one root: exactly-once, dense ledger, " +
    "cross-process monotonic timestamps") {
    import spark.implicits._
    val root = Files.createTempDirectory("xproc").resolve("t").toString
    // seed version 0 from this JVM so both workers contend on an
    // existing table (schema fixed up front)
    VersionedTable(spark, root)
      .overwrite(Seq(("seed", 0)).toDF("writer", "seq"))

    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // replicate this (forked, Spark-configured) JVM's flags: the
    // add-opens set and -D config Spark 4 on JDK 17 needs
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")
    def launch(tag: String): Process = {
      val cmd = Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp,
        "graft.ConcurrentAppendWorker", root, tag,
        appendsPerWriter.toString)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectErrorStream(true)
      pb.redirectOutput(
        Files.createTempFile(s"xproc-$tag-", ".log").toFile)
      pb.start()
    }
    val p1 = launch("w1")
    val p2 = launch("w2")
    assert(p1.waitFor(240, TimeUnit.SECONDS), "worker 1 timed out")
    assert(p2.waitFor(240, TimeUnit.SECONDS), "worker 2 timed out")
    assert(p1.exitValue() == 0, "worker 1 failed — see its temp log")
    assert(p2.exitValue() == 0, "worker 2 failed — see its temp log")

    val vt = VersionedTable(spark, root)
    // dense ledger: seed + every append exactly one version
    assert(vt.versions == (0L to (2L * appendsPerWriter)),
      s"ledger must be dense: ${vt.versions}")
    // exactly-once: each writer's n appends all present, none doubled
    val byWriter = vt.read().groupBy("writer")
      .agg(count(lit(1)).as("n"), countDistinct(col("seq")).as("d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byWriter("w1") == ((appendsPerWriter.toLong, appendsPerWriter.toLong)),
      s"w1 rows: $byWriter")
    assert(byWriter("w2") == ((appendsPerWriter.toLong, appendsPerWriter.toLong)),
      s"w2 rows: $byWriter")
    // strictly monotonic in-commit timestamps ACROSS processes
    val ts = vt.history().reverse.map(_.timestampMs)
    assert(ts.sliding(2).forall { case Seq(a, b) => a < b; case _ => true },
      s"timestamps must be strictly increasing: $ts")
  }
}
