package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.VersionedTable

/** Dev measurement: the ExactSubstr DAILY SCREEN in isolation — the step
  * the bucketed index layout (X370/X371) exists for. The
  * `dedup_substr_index` headline necessarily times build+screen+append
  * together, where the bucketed write's one-time shuffle/sort hides the
  * per-screen win; this main builds the persisted window-count index ONCE
  * in both layouts (plain appended frames vs compacted+bucketed on the
  * join keys) and then times ONLY `exactSubstrSpansIncremental` against
  * each — the recurring cost a daily pipeline actually pays. Prints one
  * JSON line with the median seconds per layout.
  *
  * `sbt "runMain graft.ScreenBench [sfDir] [iters] [windowTokens]"`
  */
object ScreenBench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(a: Array[String]): Unit = {
    val spark = GraftSession.builder("screen-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = a.lift(1).map(_.toInt).getOrElse(3)
    val w = a.lift(2).map(_.toInt).getOrElse(15)
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_screenbench_" +
      spark.sparkContext.applicationId
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)

    val docs = Tables.documents(spark, sfDir)
    val isNew = col("doc_id") % 10 === 7
    val base = docs.filter(!isNew)
    val batch = docs.filter(isNew)

    // plain layout: two appended count frames — the append-mode shape a
    // daily loop accumulates between compactions
    val plain = VersionedTable(spark, s"$root/plain")
    plain.append(Dedup.exactSubstrIndex(
      base.filter(col("doc_id") % 2 === 0), windowTokens = w))
    plain.append(Dedup.exactSubstrIndex(
      base.filter(col("doc_id") % 2 =!= 0), windowTokens = w))
    // bucketed layout: same content through the compaction path
    val bkt = VersionedTable(spark, s"$root/bkt")
    bkt.append(Dedup.exactSubstrIndex(
      base.filter(col("doc_id") % 2 === 0), windowTokens = w))
    bkt.append(Dedup.exactSubstrIndex(
      base.filter(col("doc_id") % 2 =!= 0), windowTokens = w))
    Dedup.compactSubstrIndex(bkt, nBuckets = 32)

    def time(idx: => org.apache.spark.sql.DataFrame): Double = {
      def run(): Unit = Dedup
        .exactSubstrSpansIncremental(batch, idx, windowTokens = w)
        .write.format("noop").mode("overwrite").save()
      run() // untimed warm-up
      median((1 to iters).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      })
    }

    val tPlain = time(plain.read())
    val tBkt = time(bkt.readBucketed())
    println(f"""{"metric":"substr_screen","sf":"$sfDir","iters":$iters,"w":$w,"plain_sec":$tPlain%.3f,"bucketed_sec":$tBkt%.3f,"ratio":${tPlain / tBkt}%.3f}""")
    spark.stop()
  }
}
