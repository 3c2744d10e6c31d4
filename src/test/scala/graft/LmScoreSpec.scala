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

  test("Kneser-Ney: fluent beats shuffled; unseen heads back off finitely") {
    import spark.implicits._
    val cand = Seq(
      (1L, "the cat sat on the rug"),
      (2L, "rug the on sat cat the"),
      (3L, "zebra quantum flux"))       // nothing seen: pure continuation
    val got = LmScore.kneserNeyLogLikelihood(cand.toDF("doc_id", "text"), ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(2L),
      s"fluent ${got(1L)} must beat shuffled ${got(2L)}")
    assert(!got(3L).isNaN && !got(3L).isInfinite && got(3L) < 0)
  }

  test("tercile buckets: per-group thirds, boundary score lands upward") {
    import spark.implicits._
    // group a: scores 1..9 — terciles at 3.666667/6.333333 → exact thirds.
    // group b: 0..6 — t1 lands EXACTLY on 2.0, so score 2 must take the
    // >= branch (middle, not tail); only {0, 1} are tail.
    val scored = (
      (1 to 9).map(i => (i.toLong, "a", i.toDouble)) ++
      (0 to 6).map(i => (100L + i, "b", i.toDouble))
    ).toDF("doc_id", "lang", "score")
    val got = LmScore.tercileBuckets(scored)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket"))
      .toMap
    assert((1 to 3).forall(i => got(i.toLong) == "tail"))
    assert((4 to 6).forall(i => got(i.toLong) == "middle"))
    assert((7 to 9).forall(i => got(i.toLong) == "head"))
    assert(got(100L) == "tail" && got(101L) == "tail")
    assert(got(102L) == "middle", "boundary score == t1 must be middle")
    assert(got(104L) == "head", "boundary score == t2 must be head")
    assert(got(106L) == "head")
  }

  test("Kneser-Ney discounts: seen-bigram mass per head stays below 1") {
    import spark.implicits._
    // score a doc that enumerates every seen (head, tail) once; each
    // bigram's probability must be a valid probability (0, 1)
    val probe = Seq((1L, "the cat sat on the rug the cat"))
      .toDF("doc_id", "text")
    val row = LmScore.kneserNeyLogLikelihood(probe, ref).head()
    val meanLp = row.getDouble(2)
    assert(meanLp < 0.0, s"mean log2 P must be negative, got $meanLp")
  }
}
