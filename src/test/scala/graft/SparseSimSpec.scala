package graft

import org.apache.spark.sql.execution.FormattedMode

import graft.operators.SparseSim

/** Contracts of the inverted-index TF-IDF cosine path: identical docs score
  * 1.0, disjoint-vocabulary docs never pair, the df-cap prunes hot tokens
  * from the candidate space, and the declared query stays equi-join-only.
  */
class SparseSimSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("identical documents score cosine 1.0; disjoint vocab never pairs") {
    val d = docs(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma delta",
      2L -> "epsilon zeta eta theta",
      3L -> "totally different words here")
    val out = SparseSim.tfidfCosinePairs(d, minCos = 0.1, dfCap = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(out.keySet == Set((0L, 1L))) // only the twin pair shares tokens
    assert(math.abs(out((0L, 1L)) - 1.0) < 1e-9)
  }

  test("df-cap prunes hot tokens: a universal token alone yields no pairs") {
    // "the" appears in every doc; with dfCap below the corpus size it is
    // dropped before the self-join, so docs sharing ONLY "the" never pair
    val d = docs(
      0L -> "the quick fox",
      1L -> "the lazy dog",
      2L -> "the hollow moon")
    val capped = SparseSim.tfidfCosinePairs(d, minCos = 0.01, dfCap = 2)
    assert(capped.count() == 0L)
    // with the cap relaxed the universal token SURVIVES but carries zero
    // weight (df = n → idf = ln(1) = 0): docs sharing only "the" still
    // score 0 and drop at the threshold, while (0,1) pair on "quick"
    val d2 = docs(
      0L -> "the quick fox",
      1L -> "the quick dog",
      2L -> "the hollow moon")
    val loose = SparseSim.tfidfCosinePairs(d2, minCos = 0.01, dfCap = 10)
      .collect()
    assert(loose.length == 1)
    assert((loose.head.getLong(0), loose.head.getLong(1)) == (0L, 1L))
    assert(loose.head.getLong(2) == 2L) // shared = {the, quick}
  }

  test("pairs are canonical (a < b) and cosine is bounded") {
    val out = SparseSim.tfidfCosinePairs(
      Tables.documents(spark, sf("sf0.001")), minCos = 0.2, dfCap = 100)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(3) <= 1.000001 && r.getDouble(3) >= 0.2)
    }
  }

  test("declared sim_tfidf_pairs plans equi-joins only — no cross product") {
    val p = SparkEntry.all("sim_tfidf_pairs").build(spark, sf("sf0.001"))
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"), "plans a cartesian product")
    // the 1-row corpus-size frame is the one legitimate BNLJ broadcast;
    // the posting-list self-join itself must be a hash/merge equi-join
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"))
  }
}
