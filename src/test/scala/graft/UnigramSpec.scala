package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM trainer contracts: the exact score quantization, Viterbi
  * DP picks (max score, then longest last piece), per-char fallback for
  * uncoverable/over-long tokens, segmentation closure, whole-word piece
  * dominance, and partition-invariant determinism.
  */
class UnigramSpec extends SparkSpec {

  test("scoreMap floors Laplace log-probs to integer millionths") {
    // T=4, V=2: a -> ln(2/6)*1e6 = -1098612.28..., floored
    val sm = Unigram.scoreMap(Seq(("a", 1L), ("b", 3L)))
    assert(sm == Map("a" -> -1098613L, "b" -> -405466L))
  }

  test("Viterbi picks the max-score path; uncoverable and over-long " +
    "tokens fall back to per-char pieces") {
    import spark.implicits._
    // ab is cheaper than a+b, so abab -> [ab, ab]; qq has no covering
    // pieces -> fallback 2; a 13-char token exceeds maxWordLen=12 -> 13
    val vocab = Seq(("a", -1000L), ("b", -1000L), ("ab", -1500L))
    val docs = Seq(
      (1L, "abab ba"), (2L, "qq"), (3L, "aaaaaaaaaaaaa"), (4L, ""))
      .toDF("doc_id", "text")
    val out = Unigram.encodeStats(docs, "text", "doc_id", vocab,
      maxPieceLen = 2, maxWordLen = 12)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 6L, 4L)),   // abab=[ab,ab]=2, ba=[b,a]=2
      s"got ${out(1L)}")
    assert(out(2L) == ((1L, 2L, 2L)))   // fallback: q,q
    assert(out(3L) == ((1L, 13L, 13L))) // over maxWordLen: per-char
    assert(out(4L) == ((0L, 0L, 0L)))   // zero-token doc keeps its row
  }

  test("segmentation closure: pieces concatenate back to every word") {
    import spark.implicits._
    val docs = (1 to 60).map(i => (i.toLong, "hello world hello"))
      .toDF("doc_id", "text")
    val trained = Unigram.train(docs, "text", maxPieceLen = 4,
      maxWordLen = 12, seedMulti = 10, vocabMulti = 5, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val sm = Unigram.scoreMap(trained)
    val words = Seq("hello", "world").toDF("w")
    val seg = words.select(col("w"),
      Unigram.segment(col("w"), sm, 4, 12).as("ps")).collect()
    seg.foreach { r =>
      val ps = r.getSeq[String](1)
      assert(ps.mkString("") == r.getString(0),
        s"pieces $ps must concatenate to ${r.getString(0)}")
    }
    // every corpus char survives pruning (the coverage floor)
    val pieces = trained.map(_._1).toSet
    "helowrd".foreach(c => assert(pieces.contains(c.toString)))
  }

  test("a dominant whole word becomes a single piece") {
    import spark.implicits._
    val docs = (1 to 100).map(i => (i.toLong, "abcd abcd"))
      .toDF("doc_id", "text")
    val trained = Unigram.train(docs, "text", maxPieceLen = 4,
      maxWordLen = 12, seedMulti = 8, vocabMulti = 4, rounds = 2)
    val byPiece = trained.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPiece.get("abcd").contains(200L),
      s"whole word must win the vocabulary: $byPiece")
    val enc = Unigram.encodeStats(docs, "text", "doc_id",
      trained.collect().map(r => (r.getString(0), r.getLong(2))).toSeq,
      maxPieceLen = 4, maxWordLen = 12)
    assert(enc.agg(sum(col("n_pieces"))).head.getLong(0) == 200L,
      "each abcd token must encode as ONE piece")
  }

  test("training is partition-invariant and deterministic") {
    import spark.implicits._
    val docs = (1 to 80).map(i =>
      (i.toLong, if (i % 3 == 0) "scan filter join" else "join hash scan"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Unigram.train(df, "text", maxPieceLen = 3, maxWordLen = 10,
        seedMulti = 12, vocabMulti = 6, rounds = 2)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs.repartition(1)) == run(docs.repartition(7)),
      "trained vocabulary must not depend on partitioning")
  }
}
