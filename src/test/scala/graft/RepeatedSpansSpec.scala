package graft

import graft.operators.RepeatedSpans

/** Span-merge semantics on crafted documents: a shared 6-token phrase in
  * 3 docs yields TWO overlapping flagged 5-gram positions that merge into
  * ONE span covering exactly the 6 phrase tokens; unique docs report
  * zeros; a doc repeating the phrase twice with separation reports two
  * spans.
  */
class RepeatedSpansSpec extends SparkSpec {

  private val phrase = "alpha beta gamma delta epsilon zeta"

  private def run(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    RepeatedSpans.spanStats(docs.toDF("doc_id", "text"),
      "text", "doc_id", n = 5, minCount = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]))).toMap
  }

  test("shared phrase flags a single merged span with exact coverage") {
    val docs = Seq(
      1L -> s"one two $phrase three four",
      2L -> s"$phrase tail words here",
      3L -> s"lead in words $phrase",
      4L -> "completely unrelated text with no repeats at all")
    val out = run(docs)
    // doc 1: phrase at tokens 3..8 → 5-gram positions 3 and 4 flagged,
    // overlapping → 1 span, 6 tokens covered
    assert(out(1L) == ((10L, 2L, 1L, 6L, Some(0.6))))
    assert(out(2L)._3 == 1L && out(2L)._4 == 6L)
    assert(out(3L)._3 == 1L && out(3L)._4 == 6L)
    assert(out(4L) == ((8L, 0L, 0L, 0L, Some(0.0))))
  }

  test("separated repeats of the phrase count as distinct spans") {
    val docs = Seq(
      1L -> s"$phrase x y z w v u $phrase", // two far-apart copies
      2L -> phrase,
      3L -> phrase)
    val out = run(docs)
    assert(out(1L)._3 == 2L, s"expected 2 merged spans, got ${out(1L)}")
    assert(out(1L)._4 == 12L) // both phrase copies covered, gap not
    assert(out(2L)._3 == 1L && out(2L)._4 == 6L)
  }

  test("empty and sub-n documents report zero without errors") {
    val out = run(Seq(1L -> "", 2L -> "tiny doc", 3L -> "x", 4L -> "x",
      5L -> "x"))
    assert(out(1L)._1 == 0L && out(1L)._5.isEmpty) // 0/0 → null frac
    assert(out(2L) == ((2L, 0L, 0L, 0L, Some(0.0))))
    assert(out(3L)._2 == 0L) // "x" repeats but is below span width
  }
}
