package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** The exact-proportion stratified split must hold per-stratum cell counts
  * at the ceil cuts exactly, stay invariant under repartitioning, and the
  * two-phase bucketed rank must equal a direct per-stratum sort rank.
  */
class StratifiedSplitSpec extends SparkSpec {
  import spark.implicits._

  private val cuts = Seq(0.8 -> "train", 0.9 -> "val")

  private def docs(sizes: Map[String, Int]) = sizes.toSeq.flatMap {
    case (s, n) => (0 until n).map(i => (s"$s-$i".hashCode.toLong << 8 | i,
      s))
  }.toDF("doc_id", "lang")

  test("per-stratum cell counts sit exactly at the ceil cuts") {
    val df = docs(Map("en" -> 100, "de" -> 37, "fr" -> 7))
    val got = Sampling.stratifiedExactSplit(df, "lang", "doc_id", "s1",
        cuts, "test")
      .groupBy("lang", "split").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    def expected(n: Int): Map[String, Long] = {
      val t = math.ceil(0.8 * n).toLong
      val v = math.ceil(0.9 * n).toLong - t
      Map("train" -> t, "val" -> v, "test" -> (n - t - v))
        .filter(_._2 > 0)
    }
    for ((lang, n) <- Map("en" -> 100, "de" -> 37, "fr" -> 7);
         (split, c) <- expected(n))
      assert(got.getOrElse((lang, split), 0L) == c,
        s"$lang/$split: got ${got.get((lang, split))}, want $c of $n")
    // a 7-doc stratum still holds exact shares: 6 train, 1 val, 0 test
    assert(got((("fr", "train"))) == 6L && got((("fr", "val"))) == 1L)
    assert(!got.contains(("fr", "test")))
  }

  test("assignment is partition-invariant and seed-sensitive") {
    val df = docs(Map("en" -> 50, "de" -> 20))
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      Sampling.stratifiedExactSplit(d, "lang", "doc_id", seed, cuts, "test")
        .select("doc_id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = run(df, "s1")
    assert(run(df.repartition(7), "s1") == base)
    assert(run(df.repartition(1), "s1") == base)
    assert(run(df, "s2") != base, "a different seed must reshuffle cuts")
  }

  test("bucketed two-phase rank == direct per-stratum sort rank") {
    import org.apache.spark.sql.expressions.Window
    val df = docs(Map("en" -> 80, "de" -> 33))
    val key = md5(concat_ws(":", lit("s1"), col("doc_id").cast("string")))
    val w = Window.partitionBy("lang").orderBy(key, col("doc_id"))
    val n = Window.partitionBy("lang")
    val direct = df
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .withColumn("n", count(lit(1)).over(n))
      .withColumn("split",
        when(col("pos") < ceil(lit(0.8) * col("n")), "train")
          .when(col("pos") < ceil(lit(0.9) * col("n")), "val")
          .otherwise("test"))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Sampling.stratifiedExactSplit(df, "lang", "doc_id", "s1",
        cuts, "test")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == direct)
  }

  test("a NULL stratum is a first-class group, never a silent drop") {
    val df = (0L until 90L).map { i =>
      (i, if (i % 3 == 0) null else s"lang${i % 2}")
    }.toDF("doc_id", "lang")
    val got = Sampling.stratifiedExactSplit(df, "lang", "doc_id", "s1",
      Seq(0.5 -> "train"), "test")
      .select("doc_id", "lang", "split").collect()
    // every input row comes back with a split assigned
    assert(got.length == 90)
    // and the null stratum got its EXACT ceil(0.5*30)=15/15 cut
    val nulls = got.filter(_.isNullAt(1)).map(_.getString(2))
    assert(nulls.length == 30)
    assert(nulls.count(_ == "train") == 15 && nulls.count(_ == "test") == 15)
  }

  test("a data-sized stratum column rejects loudly instead of OOMing the driver") {
    // 200 distinct strata under a cap of 100 cells: the bounded collect
    // must reject with an actionable message naming the knob, not pull an
    // unbounded (strata × 4096) frame onto the driver
    val df = (0L until 200L).map(i => (i, s"host$i")).toDF("doc_id", "host")
    spark.conf.set(Sampling.MaxCellsConf, "100")
    try {
      val e = intercept[IllegalArgumentException] {
        Sampling.stratifiedExactSplit(df, "host", "doc_id", "s1",
          Seq(0.5 -> "train"), "test").collect()
      }
      assert(e.getMessage.contains(Sampling.MaxCellsConf))
      val e2 = intercept[IllegalArgumentException] {
        Sampling.interleaveBySource(df, "doc_id", "host", "s1").collect()
      }
      assert(e2.getMessage.contains(Sampling.MaxCellsConf))
    } finally spark.conf.unset(Sampling.MaxCellsConf)
  }
}
