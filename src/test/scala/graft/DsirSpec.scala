package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance-weight contracts: partition-invariant determinism (the
  * md5-bucket + exact-count discipline), separability (the target subset
  * must score higher than the rest when the target actually differs — here
  * a synthetic corpus whose target docs carry a distinct vocabulary), and
  * totality (every tokenized doc gets a finite weight).
  */
class DsirSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    // 40 target docs over one vocabulary, 160 raw docs over another, with
    // a shared stopword so the distributions overlap but differ
    val target = (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma shared alpha beta tok$i", true))
    val raw = (0 until 160).map(i =>
      (1000L + i, s"delta epsilon zeta shared delta epsilon tok$i", false))
    (target ++ raw).toDF("doc_id", "text", "is_target")
  }

  test("weights are partition-invariant and deterministic") {
    val docs = corpus
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      Dsir.importanceWeights(df, "text", "doc_id", col("is_target"), b = 64)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(7, col("doc_id")))
    assert(a == b, "importance weights must not depend on partitioning")
    assert(a.size == 200)
  }

  test("zero-token docs keep a row with the empty-sum values (0, 0.0)") {
    import spark.implicits._
    val docs = corpus.unionByName(Seq(
      (9000L, "", false), (9001L, "   ", false))
      .toDF("doc_id", "text", "is_target"))
    val w = Dsir.importanceWeights(docs, "text", "doc_id",
      col("is_target"), b = 64)
    assert(w.count() == 202, "EVERY document gets a weight row")
    val empty = w.filter(col("doc_id") >= 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(empty.toSet == Set((9000L, 0L, 0.0), (9001L, 0L, 0.0)))
  }

  test("target docs out-score raw docs when the distributions differ") {
    val w = Dsir.importanceWeights(corpus, "text", "doc_id",
      col("is_target"), b = 64)
    val byGroup = w.withColumn("tgt", col("doc_id") < 1000L)
      .groupBy("tgt").agg(avg(col("log_weight")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(byGroup(true) > byGroup(false) + 0.5,
      s"target mean ${byGroup(true)} must clearly exceed raw mean ${byGroup(false)}")
    // and every weight is finite (smoothing covers unseen buckets)
    assert(w.filter(col("log_weight").isNull ||
      isnan(col("log_weight"))).count() == 0)
  }

  test("selection head on the real corpus is en-enriched") {
    // the declared query's target is lang = 'en'; its top-50 head should
    // hold a higher en-share than the corpus base rate (43.6% at sf0.01)
    val docs = Tables.documents(spark, sf("sf0.01"))
    val w = Dsir.importanceWeights(docs, "text", "doc_id",
      col("lang") === "en", b = 256)
    val top = w.orderBy(col("log_weight").desc, col("doc_id")).limit(50)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val enShare = top.filter(col("lang") === "en").count() / 50.0
    val base = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    assert(enShare > base,
      f"top-50 en-share $enShare%.2f must beat the base rate $base%.2f")
  }

  test("Gumbel sample: deterministic, seed-sensitive, weight-dominated") {
    import spark.implicits._
    // one doc with overwhelming weight must appear in EVERY seed's sample
    val w = ((1 to 200).map(i => (i.toLong, 10L, -50.0)) :+
      ((999L, 10L, 200.0))).toDF("doc_id", "n_tokens", "log_weight")
    def ids(seed: String, df: org.apache.spark.sql.DataFrame) =
      Dsir.gumbelTopK(df, seed, k = 10).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val s1 = ids("a", w)
    assert(s1 == ids("a", w.repartition(13))) // partition-invariant
    val s2 = ids("b", w)
    assert(s1 != s2, "different seeds must draw different samples")
    assert(Seq("a", "b", "c", "d").forall(s => ids(s, w).contains(999L)),
      "the dominant-weight doc must be sampled under every seed")
  }
}
