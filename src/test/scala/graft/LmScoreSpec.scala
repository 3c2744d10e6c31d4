package graft

import org.apache.spark.sql.functions._

import graft.operators.LmScore

/** The bigram LM must prefer reference-like text over shuffled gibberish,
  * smooth unseen n-grams instead of -inf, and skip unjudgeable docs.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq(
    (100L, "the cat sat on the mat"),
    (101L, "the dog sat on the rug"),
    (102L, "a cat and a dog sat here")).toDF("doc_id", "text")

  test("fluent text outscores shuffled gibberish") {
    val cand = Seq(
      (1L, "the cat sat on the rug"),  // reference-like
      (2L, "rug the on sat cat the"))  // same tokens, shuffled
    val got = LmScore.bigramLogLikelihood(cand.toDF("doc_id", "text"), ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(2L),
      s"fluent ${got(1L)} must beat shuffled ${got(2L)}")
  }

  test("unseen bigrams smooth, never -infinity") {
    val cand = Seq((1L, "zebra quantum flux")).toDF("doc_id", "text")
    val row = LmScore.bigramLogLikelihood(cand, ref).head()
    assert(row.getLong(1) == 2L) // 2 bigrams
    val s = row.getDouble(2)
    assert(!s.isNaN && !s.isInfinite && s < 0)
  }

  test("docs with fewer than two tokens are absent, not crashed on") {
    val cand = Seq((1L, "single"), (2L, ""), (3L, "two tokens"))
      .toDF("doc_id", "text")
    val ids = LmScore.bigramLogLikelihood(cand, ref)
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(3L))
  }
}
