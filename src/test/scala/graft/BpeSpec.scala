package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE trainer contract: hand-computed merge sequence on a crafted
  * corpus, deterministic tie-break, non-increasing chosen counts,
  * merge-table closure (merged = left + right), and early stop when no
  * pair repeats.
  */
class BpeSpec extends SparkSpec {

  private def words(ws: (String, Long)*) = {
    import spark.implicits._
    ws.toDF("w", "freq")
  }

  test("hand-computed merge sequence: ab then abc, early stop") {
    // pairs: (a,b) = 3+2 = 5, (b,c) = 2 → merge1 (a,b)->ab @5
    // then words are [ab]x3, [ab,c]x2 → merge2 (ab,c)->abc @2 → no pairs
    val out = Bpe.train(words("ab" -> 3L, "abc" -> 2L), k = 5)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "a", "b", "ab", 5L),
      (2, "ab", "c", "abc", 2L)))
  }

  test("tie-break is (count desc, left asc, right asc)") {
    // (a,b) and (c,d) both appear twice → (a,b) wins lexicographically
    val out = Bpe.train(words("ab" -> 2L, "cd" -> 2L), k = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(out == Seq(("a", "b")))
  }

  test("chosen pair counts are non-increasing; merged = left + right") {
    val docs = {
      import spark.implicits._
      Seq("the cat sat on the mat", "the cat ate the rat",
        "that cat that sat", "the the the that mat")
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
    }
    val out = Bpe.trainOnCorpus(docs, "text", k = 8)
      .orderBy("rank").collect()
    assert(out.nonEmpty)
    val counts = out.map(_.getLong(4)).toSeq
    assert(counts == counts.sorted.reverse, s"counts not non-increasing: $counts")
    out.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
    // ranks are 1..n with no gaps
    assert(out.map(_.getInt(0)).toSeq == (1 to out.length))
  }

  test("encodeStats applies ordered merges greedily and reports exact stats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the then at"), // th→the; th+e+n; a+t
      (2L, ""),
      (3L, "zzz")).toDF("doc_id", "text")
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "t")
    val out = Bpe.encodeStats(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    // "the"→[the]=1, "then"→[the,n]=2, "at"→[at]=3? no: merge (a,t)
    // IS in the list → [at]=1 symbol. chars=3+4+2=9, symbols=1+2+1=4
    assert(out(1L) == ((3L, 9L, 4L, Some(2.25))))
    assert(out(2L) == ((0L, 0L, 0L, None)))
    assert(out(3L) == ((1L, 3L, 3L, Some(1.0)))) // no merge applies
  }

  test("greedy left-to-right application handles overlaps (aaa -> [aa, a])") {
    // pair (a,a) counts 2 in "aaa" (overlapping) but greedy merges once
    val out = Bpe.train(words("aaa" -> 2L), k = 2)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    // merge1 (a,a) @ 2*2=4 (two adjacent pairs x freq 2)
    assert(out.head == (("a", "a", 4L)))
    // after merge: [aa, a] → pair (aa, a) @ 2 → merge2
    assert(out(1) == (("aa", "a", 2L)))
  }
}
