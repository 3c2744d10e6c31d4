package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Unigram

/** Viterbi-DP invariants over RANDOM vocabularies and words — the
  * properties that must hold for any input, complementing UnigramSpec's
  * fixtures and the sf-scale train/encode oracles. The strongest: the
  * DP's chosen segmentation achieves exactly the brute-force optimum
  * over ALL enumerable segmentations of the word.
  */
object UnigramProperties extends Properties("Unigram") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark =
    GraftSession.builder("unigram-props", cores = 4).getOrCreate()
  import spark.implicits._

  private val maxPieceLen = 3

  // words over a 3-char alphabet so random vocab pieces actually hit
  private val genWord: Gen[String] =
    Gen.chooseNum(1, 7).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  // a vocabulary that always covers the alphabet (the trainer's
  // coverage floor) plus random multi-char pieces with random scores
  private val genVocab: Gen[Map[String, Long]] = for {
    multi <- Gen.listOfN(6,
      Gen.chooseNum(2, maxPieceLen).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    scores <- Gen.listOfN(3 + multi.size, Gen.chooseNum(-5000000L, -1000L))
  } yield (Seq("a", "b", "c") ++ multi.distinct).zip(scores).toMap

  /** All segmentations of `w` into vocab pieces (≤ maxPieceLen), scored. */
  private def enumerate(w: String, vocab: Map[String, Long]): Seq[Long] = {
    if (w.isEmpty) Seq(0L)
    else (1 to math.min(maxPieceLen, w.length)).flatMap { k =>
      vocab.get(w.take(k)) match {
        case Some(s) => enumerate(w.drop(k), vocab).map(_ + s)
        case None => Seq.empty
      }
    }
  }

  private def segmentAll(words: Seq[String],
                         vocab: Map[String, Long]): Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"),
        Unigram.segment(col("w"), vocab, maxPieceLen, maxWordLen = 12)
          .as("ps"))
      .collect()
      .map(r => r.getString(0) ->
        Option(r.getSeq[String](1)).map(_.toSeq).orNull)
      .toMap

  property("DP achieves the brute-force optimal segmentation score") =
    Prop.forAll(Gen.listOfN(5, genWord), genVocab) { (words, vocab) =>
      val segs = segmentAll(words.distinct, vocab)
      words.distinct.forall { w =>
        val ps = segs(w)
        val best = enumerate(w, vocab).max // alphabet covered => non-empty
        val dpScore = ps.map(vocab).sum
        ps.mkString("") == w && ps.forall(p => vocab.contains(p)) &&
          dpScore == best
      }
    }

  property("an uncovered word segments to null (caller fallback), a " +
    "covered one never does") =
    Prop.forAll(Gen.listOfN(4, genWord)) { words =>
      // vocab missing 'c' entirely: words containing c are uncoverable
      val vocab = Map("a" -> -1000L, "b" -> -1000L, "ab" -> -1500L)
      val segs = segmentAll(words.distinct, vocab)
      words.distinct.forall { w =>
        if (w.contains('c')) segs(w) == null
        else segs(w) != null && segs(w).mkString("") == w
      }
    }
}
