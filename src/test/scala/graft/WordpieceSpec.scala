package graft

import graft.operators.Wordpiece

/** WordPiece trainer invariants: the likelihood-ratio criterion must beat
  * raw frequency where the two disagree, the ## prefix structure must
  * survive merging, and training must be a pure function of the corpus.
  */
class WordpieceSpec extends SparkSpec {
  import spark.implicits._

  test("likelihood ratio picks the predictive pair over the frequent one") {
    // "xy" ×3: pair (x,##y) c=3, f_x=3, f_y=3 → score 3/9 ≈ 0.333
    // "ab" ×4 plus a,b noise: c=4 but f_a=12, f_b=12 → score 4/144 ≈ 0.028
    // BPE (raw frequency) would merge (a,##b); WordPiece must take (x,##y)
    val words = Seq(("xy", 3L), ("ab", 4L), ("aa", 4L), ("bb", 4L))
      .toDF("w", "freq")
    val got = Wordpiece.train(words, k = 1).collect()(0)
    assert(got.getString(1) == "x" && got.getString(2) == "##y",
      s"picked ${got.getString(1)}+${got.getString(2)}")
    assert(got.getString(3) == "xy" && got.getLong(4) == 3L)
  }

  test("## structure: word-initial merges bare, internal merges keep ##") {
    // "abcd" ×5: every adjacent pair has c=5; f depends on position.
    // f(a)=f(##b)=f(##c)=f(##d)=5 → all scores 5/25; tie-break (l, r)
    // ascending picks (##b, ##c) since '#' < any letter → merged "##bc"
    val words = Seq(("abcd", 5L)).toDF("w", "freq")
    val got = Wordpiece.train(words, k = 3).collect()
    assert(got(0).getString(3) == "##bc", s"r1 merged ${got(0).getString(3)}")
    // after round 1 syms are [a, ##bc, ##d]: scores equal again, ties →
    // (##bc, ##d) → "##bcd"; then (a, ##bcd) → "abcd"
    assert(got(1).getString(3) == "##bcd")
    assert(got(2).getString(3) == "abcd")
    // closure: merged always = left + right minus its ## prefix
    got.foreach { r =>
      assert(r.getString(3) ==
        r.getString(1) + r.getString(2).stripPrefix("##"))
    }
  }

  test("deterministic and partition-invariant on real documents") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val a = Wordpiece.trainOnCorpus(docs, "text", k = 6)
      .collect().map(_.toSeq).toSeq
    val b = Wordpiece.trainOnCorpus(docs.repartition(13), "text", k = 6)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 6 && a.map(_(3)).distinct.size == 6)
  }

  test("max-munch encode: longest match wins, char floor, over-long fallback") {
    val pieces = Seq("li", "wi", "qu", "lin", "win", "wind", "th",
      "##sh", "##ch", "fi")
    val docs = Seq(
      (1L, "window"),      // wind + ##o + ##w            → 3
      (2L, "lint"),        // lin + ##t                   → 2
      (3L, "windy"),       // wind + ##y                  → 2
      (4L, "fish"),        // fi + ##sh                   → 2
      (5L, "abc"),         // a + ##b + ##c (char floor)  → 3
      (6L, "wi li"),       // wi, li                      → 1 + 1
      (7L, "aaaaaaaaaaaaa") // 13 chars > maxWordLen=12   → 13
    ).toDF("doc_id", "text")
    val got = Wordpiece.encodeStats(docs, "text", "doc_id", pieces,
        maxWordLen = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 3L,
      6L -> 2L, 7L -> 13L), got.toString)
  }

  test("fertility by group sums the same counts at group grain") {
    val pieces = Seq("wind", "##sh")
    val docs = Seq(("a", "window fish"), ("a", "wind"), ("b", "sh"))
      .toDF("lang", "text")
    // a: window=wind+##o+##w (3) + fish=f+i+##sh (3) + wind (1) = 7 pieces,
    //    3 tokens, 14 chars; b: sh = s+##h = 2 pieces, 1 token, 2 chars
    val got = Wordpiece.fertilityByGroup(docs, "text", "lang", pieces)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") == ((3L, 14L, 7L)), got.toString)
    assert(got("b") == ((1L, 2L, 2L)))
  }

  test("scores are exact-integer ratios and non-negative") {
    val words = Seq(("aab", 7L), ("ab", 2L), ("ba", 3L)).toDF("w", "freq")
    val got = Wordpiece.train(words, k = 4).collect()
    got.foreach { r =>
      val (c, s) = (r.getLong(4), r.getDouble(5))
      assert(c >= 2L && s > 0.0 && s <= 1.0,
        s"rank ${r.getInt(0)}: c=$c score=$s")
    }
  }
}
