package graft

import graft.operators.Dedup
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Persisted dedup-index maintenance: screening from stored postings
  * must equal reshingling from scratch, and a multi-day append cycle
  * (screen batch, append its postings, repeat) must keep that equality
  * as the index accumulates commits — the differential that makes the
  * daily screen affordable without ever rebuilding the base.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def root(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_disspec_$tag" +
      s"_${spark.sparkContext.applicationId}"

  test("three-day append cycle: each screen equals the from-scratch join") {
    val day0 = mk(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six")
    val day1 = mk(11L -> "alpha beta gamma delta zeta",   // near-dup of 1
      12L -> "totally different words here now")
    val day2 = mk(21L -> "alpha beta gamma delta epsilon", // exact of 1
      22L -> "one two three four five seven")              // near-dup of 2
    val vt = VersionedTable(spark, root("cycle"))
    vt.overwrite(Dedup.postings(day0, n = 3))

    def screen(batch: org.apache.spark.sql.DataFrame) = {
      val posts = Dedup.postings(batch, n = 3).localCheckpoint(true)
      val got = Dedup.crossJaccardFromPostings(posts, vt.read(),
        minJaccard = 0.4).collect().map(_.toSeq).toSet
      vt.append(posts)
      got
    }
    def direct(batch: org.apache.spark.sql.DataFrame,
               base: org.apache.spark.sql.DataFrame) =
      Dedup.crossJaccardPairs(batch, base, n = 3, minJaccard = 0.4)
        .collect().map(_.toSeq).toSet

    val s1 = screen(day1)
    assert(s1 == direct(day1, day0) && s1.map(_.head) == Set(11L))
    // day-2 screens against day0 ∪ day1 — the APPENDED index, no rebuild
    val s2 = screen(day2)
    assert(s2 == direct(day2, day0.unionAll(day1)))
    assert(s2.map(_.head) == Set(21L, 22L))
    assert(vt.latestVersion.contains(2L)) // build + 2 pure appends
  }

  test("hot-shingle cap semantics survive the index round-trip") {
    // a shingle present in every doc is hot under cap=2 and must be
    // ignored identically whether postings come from the table or fresh
    val base = mk(1L -> "cap cap cap x1 y1", 2L -> "cap cap cap x2 y2",
      3L -> "cap cap cap x3 y3")
    val batch = mk(31L -> "cap cap cap x1 y1")
    val vt = VersionedTable(spark, root("cap"))
    vt.overwrite(Dedup.postings(base, n = 3))
    val fromIdx = Dedup.crossJaccardFromPostings(
      Dedup.postings(batch, n = 3).localCheckpoint(true), vt.read(),
      minJaccard = 0.1, maxShingleFreq = Some(2))
      .collect().map(_.toSeq).toSet
    val fresh = Dedup.crossJaccardPairs(batch, base, n = 3,
      minJaccard = 0.1, maxShingleFreq = Some(2))
      .collect().map(_.toSeq).toSet
    assert(fromIdx == fresh)
  }
}
