package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.SharedPass

/** Reliable-checkpoint mode for the shared-pass corpus bases
  * (`graft.checkpoint.reliable`): same answers as the localCheckpoint
  * default, materialized through the fault-tolerant checkpoint FS.
  */
class SharedPassSpec extends SparkSpec {

  private def gopher(dir: String) =
    SparkEntry.all("corpus_gopher_filter").build(spark, dir)
      .collect().map(_.toSeq).toSeq

  test("reliable mode reproduces the localCheckpoint answer exactly") {
    val local = gopher(sf())
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(SharedPass.ReliableConf, "true")
    spark.conf.set(SharedPass.DirConf, ckpt)
    try {
      val reliable = gopher(sf())
      assert(reliable === local)
      // the base frame really went through the reliable checkpoint dir
      val ckptFiles = Files.walk(Paths.get(ckpt)).filter(Files.isRegularFile(_))
        .count()
      assert(ckptFiles > 0, "no reliable checkpoint files were written")
    } finally {
      spark.conf.set(SharedPass.ReliableConf, "false")
      spark.conf.unset(SharedPass.DirConf)
    }
  }

  test("reliable mode without a dir fails loudly (unless one is pre-set)") {
    val df = spark.range(3).select(col("id"))
    spark.conf.set(SharedPass.ReliableConf, "true")
    try {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val e = intercept[IllegalArgumentException](SharedPass.materialize(df))
        assert(e.getMessage.contains(SharedPass.DirConf))
      } else {
        // a prior reliable run installed a dir on the shared context;
        // materialize must then just work
        assert(SharedPass.materialize(df).count() === 3)
      }
    } finally spark.conf.set(SharedPass.ReliableConf, "false")
  }

  test("default mode stays localCheckpoint (no checkpoint-dir requirement)") {
    val df = spark.range(4).select(col("id"))
    assert(SharedPass.materialize(df).count() === 4)
  }

  test("cleanup sweeps stale checkpointed frames, keeps fresh ones") {
    // simulate the Spark layout <root>/<ctx-uuid>/rdd-N/part-* with one
    // stale and one fresh frame; only the stale one must go
    val root = Files.createTempDirectory("graft-ckpt-clean").toString
    val ctx = Paths.get(root, "ctx-uuid-1")
    val stale = ctx.resolve("rdd-1"); val fresh = ctx.resolve("rdd-2")
    Files.createDirectories(stale); Files.createDirectories(fresh)
    Files.writeString(stale.resolve("part-00000"), "old")
    Files.writeString(fresh.resolve("part-00000"), "new")
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    Files.setLastModifiedTime(stale,
      java.nio.file.attribute.FileTime.fromMillis(old))
    val removed = SharedPass.cleanup(spark, 24L * 3600 * 1000,
      rootOverride = Some(root))
    assert(removed == 1)
    assert(!Files.exists(stale) && Files.exists(fresh))
    assert(Files.exists(fresh.resolve("part-00000")))
    // a second sweep is a no-op; sweeping everything clears the rest and
    // prunes the emptied context dir once it is stale itself
    assert(SharedPass.cleanup(spark, 24L * 3600 * 1000,
      rootOverride = Some(root)) == 0)
    assert(SharedPass.cleanup(spark, 0L, rootOverride = Some(root)) == 1)
    assert(!Files.exists(fresh))
    // a missing root is a zero, not an error
    assert(SharedPass.cleanup(spark, 0L,
      rootOverride = Some(s"$root-nope")) == 0)
  }

  test("cleanup never sweeps the calling session's own live context dir") {
    // a long job's materialized frame can be hours old and still feeding
    // a live computation — mtime alone must not reclaim it out from
    // under the session that owns it
    val root = Files.createTempDirectory("graft-ckpt-own").toString
    spark.sparkContext.setCheckpointDir(root)
    val own = Paths.get(new java.net.URI(
      spark.sparkContext.getCheckpointDir.get).getPath)
    val mine = own.resolve("rdd-7")
    Files.createDirectories(mine)
    Files.writeString(mine.resolve("part-00000"), "live")
    val foreignCtx = Paths.get(root, "ctx-dead-session")
    val foreign = foreignCtx.resolve("rdd-1")
    Files.createDirectories(foreign)
    Files.writeString(foreign.resolve("part-00000"), "stale")
    val old = java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000)
    Files.setLastModifiedTime(mine, old)
    Files.setLastModifiedTime(foreign, old)
    Files.setLastModifiedTime(foreignCtx, old)
    // even at olderThanMs=0 (sweep EVERYTHING stale) the session's own
    // context dir survives wholesale; the dead session's frame goes
    assert(SharedPass.cleanup(spark, 0L, rootOverride = Some(root)) == 1)
    assert(Files.exists(mine.resolve("part-00000")), "live frame swept")
    assert(!Files.exists(foreign), "dead session's frame kept")
  }
}
