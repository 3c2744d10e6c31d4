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
}
