package graft

import graft.operators.Repetition

/** Hand-computed Gopher-rule cases: per-occurrence top-n-gram mass
  * (overlaps count, ties break lexicographically) and position-union
  * duplicate-gram coverage (overlaps never double-count).
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("top n-gram fractions: counts, tie-break, overlap mass") {
    // tokens [a b a b a b], tchars = 6
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val got = Repetition
      .topNgramFractions(docs, "text", "doc_id", Seq(2, 3, 4))
      .orderBy("n")
      .collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3), r.getDouble(5)))
    // n=2: "a b" x3 beats "b a" x2 -> 3*2/6 = 1.0
    assert(got(0) == ((2, "a b", 3L, 1.0)))
    // n=3: "a b a" x2 ties "b a b" x2 -> lexicographic pick, 2*3/6 = 1.0
    assert(got(1) == ((3, "a b a", 2L, 1.0)))
    // n=4: "a b a b" x2 (overlapping occurrences both count) -> 2*4/6
    assert(got(2) == ((4, "a b a b", 2L, 1.333333)))
  }

  test("short docs are absent per order, not zero-filled") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val ns = Repetition.topNgramFractions(docs, "text", "doc_id", Seq(2, 3, 4))
      .collect().map(_.getInt(1)).toSet
    assert(ns == Set(2, 3)) // no 4-gram exists in a 3-token doc
  }

  test("duplicate-gram coverage unions overlapping spans") {
    // dup 2-grams "x y"@{1,4}, "y z"@{2,5} -> covered positions {1..6} of 7
    val docs = Seq(
      (1L, "x y z x y z w"),
      (2L, "all unique words here")).toDF("doc_id", "text")
    val got = Repetition.dupNgramCoverage(docs, "text", "doc_id", n = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got(0) == ((1L, 7L, 7L, 6L, 0.857143)))
    assert(got(1)._4 == 0L && got(1)._5 == 0.0) // clean doc kept, zeroed
  }

  test("coverage is partition-invariant") {
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, if (i % 2 == 0) "p q r p q r s t" else s"u$i v$i w$i x$i y$i")
    }.toDF("doc_id", "text")
    val one = Repetition.dupNgramCoverage(docs.repartition(1), "text", "doc_id", 3)
      .orderBy("doc_id").collect().toSeq
    val many = Repetition.dupNgramCoverage(docs.repartition(13), "text", "doc_id", 3)
      .orderBy("doc_id").collect().toSeq
    assert(one == many)
  }
}
