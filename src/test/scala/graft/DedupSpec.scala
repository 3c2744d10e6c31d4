package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Lakehouse

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions shingles == expression shingles (sync guard)") {
    val docs = Tables.documents(spark, sf()).limit(200)
    val fast = Dedup.shingleSets(docs, 3)
    val expr = docs.select(col("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val mismatch = fast.as("f").join(expr.as("e"), Seq("doc_id"), "outer")
      .filter(col("f.sh").isNull || col("e.sh").isNull ||
        col("f.sh") =!= col("e.sh"))
    assert(mismatch.isEmpty)
  }

  test("base-hash expression == mapPartitions hash (sync guard)") {
    val docs = Tables.documents(spark, sf()).limit(50)
    val fast = Dedup.shingleSetsHashed(docs, 3)
      .select(col("doc_id"), col("hs"))
    val viaExpr = Dedup.shingleSets(docs, 3)
      .select(col("doc_id"),
        transform(col("sh"), s => Dedup.baseHash32(s)).as("hs"))
    assert(fast.exceptAll(viaExpr).isEmpty && viaExpr.exceptAll(fast).isEmpty)
  }

  test("minhash LSH recall: finds exactly the exact-Jaccard pairs here") {
    val docs = Tables.documents(spark, sf())
    // uncapped exact baseline — the calibration reference, not the
    // production (capped) path
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.5, maxShingleFreq = None)
      .select("a", "b", "jaccard").collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 16, 8, 0.5)
      .select("a", "b", "jaccard").collect().toSet
    assert(lsh.subsetOf(exact))           // LSH never invents pairs
    assert(lsh == exact)                  // and at j>=0.5, b=8/r=2 finds all
    assert(exact.nonEmpty)                // planted dups exist in testdata
  }

  test("hot-shingle cap: capped pairs ⊆ uncapped; non-binding cap is identity") {
    val docs = Tables.documents(spark, sf())
    val uncapped = Dedup.ngramJaccardPairs(docs, 3, 0.5, maxShingleFreq = None)
      .select("a", "b").collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, 3, 0.5)  // default cap ON
      .select("a", "b").collect().toSet
    assert(capped.subsetOf(uncapped)) // the cap only shrinks the candidate space
    val huge = Dedup.ngramJaccardPairs(docs, 3, 0.5, maxShingleFreq = Some(1 << 20))
      .select("a", "b").collect().toSet
    assert(huge == uncapped)          // a cap that never binds changes nothing
  }

  test("simhashFast == expression simhash (sync guard)") {
    val docs = Tables.documents(spark, sf()).limit(100)
    val fast = Dedup.simhashFast(docs, 32)
    val expr = Dedup.simhash(docs, 32)
    assert(fast.exceptAll(expr).isEmpty && expr.exceptAll(fast).isEmpty)
  }

  test("weighted SimHash separates shared-vocab docs that set-SimHash collides") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def sig(weighted: Boolean, texts: String*): Seq[Long] = {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      Dedup.simhashFast(docs, 32, weighted = weighted)
        .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    }
    // identical token SET, wildly different frequency profiles
    val a = "alpha beta gamma delta " * 1 + "alpha " * 40
    val b = "alpha beta gamma delta " * 1 + "delta " * 40
    val Seq(ua, ub) = sig(weighted = false, a, b)
    val Seq(wa, wb) = sig(weighted = true, a, b)
    assert(hamming(ua, ub) == 0, "set-SimHash cannot see the frequency skew")
    assert(hamming(wa, wb) > 3, s"weighted should separate, got ${hamming(wa, wb)}")
    // and identical docs still collide under both
    val Seq(w1, w2) = sig(weighted = true, a, a)
    assert(w1 == w2)
  }

  test("exact dedup keeps one row per normalized text") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L)) // min doc_id wins within a fingerprint group
  }

  test("mergeRuns: latest updated_at wins per id across runs") {
    val runs = Seq(
      (1L, "2024-01-01T00:00:00Z", "old"),
      (1L, "2024-02-01T00:00:00Z", "new"),
      (2L, "2024-01-05T00:00:00Z", "only")
    ).toDF("id", "updated_at", "title")
    val merged = Lakehouse.mergeRuns(runs)
      .select("id", "title").as[(Long, String)].collect().toMap
    assert(merged == Map(1L -> "new", 2L -> "only"))
  }
}
