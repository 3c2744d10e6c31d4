package graft

import graft.operators.Blocklist

/** Blocklist screen invariants: exact-token word matching (no substring
  * bleed), length-delta phrase counting, the ANY-hit drop rule, and the
  * maxHits loosening.
  */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("a", "bad word here"),           // 1 word hit
    ("a", "badge is not bad-ness"),   // 0: token match only, no substrings
    ("a", "really bad bad phrase of doom"), // 2 word + 1 phrase hit
    ("b", "clean text entirely"),     // 0
    ("b", "PHRASE OF DOOM shouts")    // 1 phrase hit (lowercased first)
  ).toDF("source", "text")

  private def screen(maxHits: Long) = Blocklist.screen(
    docs, "text", "source", words = Seq("bad"),
    phrases = Seq("phrase of doom"), maxHits = maxHits)
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))).toMap

  test("any-hit drop: word and phrase grains, exact-token semantics") {
    val got = screen(0L)
    // a: 3 docs, 2 flagged, word hits 1+0+2, phrase hits 0+0+1
    assert(got("a") == ((3L, 2L, 3L, 1L)))
    // b: 2 docs, 1 flagged (uppercase phrase still hits), 0 word hits
    assert(got("b") == ((2L, 1L, 0L, 1L)))
  }

  test("maxHits loosens the rule: only the 3-hit doc drops at maxHits=2") {
    val got = screen(2L)
    assert(got("a")._2 == 1L && got("b")._2 == 0L)
  }
}
