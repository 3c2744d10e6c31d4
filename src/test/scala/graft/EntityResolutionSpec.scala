package graft

import org.apache.spark.sql.functions._

import graft.operators.EntityResolution

/** Blocking + edit-distance + transitive clustering on hand-built typo
  * variants.
  */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("typo variants cluster transitively; distinct entities stay apart") {
    val recs = Seq(
      (1L, "acme corp"), (2L, "acme c0rp"), (3L, "acme cxrp"),
      (4L, "apex corp"),                       // same block, dist 2 from acme
      (5L, "zenith ltd"), (6L, "zenith ltd")). // exact duplicate
      toDF("id", "name")
    val got = EntityResolution.resolve(recs, "id", "name",
        blockKey = substring(col("name"), 1, 2), maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2 and 3 both within dist 1 of 1 (and dist 2 of each other):
    // transitivity pulls all three into cluster 1
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 4L) // dist 2: separate entity
    assert(got(5L) == 5L && got(6L) == 5L)
  }

  test("blocking prevents cross-block comparison even at distance 0") {
    val recs = Seq((1L, "same name"), (2L, "same name")).toDF("id", "name")
    // block on the id itself → different blocks → never compared
    val pairs = EntityResolution.fuzzyPairs(recs, "id", "name",
      blockKey = col("id"), maxDist = 0)
    assert(pairs.isEmpty)
  }

  test("hot-block cap keeps first-K by id, deterministically") {
    val recs = (1L to 10L).map(i => (i, "dup")).toDF("id", "name")
    val pairs = EntityResolution.fuzzyPairs(recs, "id", "name",
      blockKey = lit("all"), maxDist = 0, maxBlockSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only ids 1..3 survive the cap → exactly the 3 pairs among them
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
