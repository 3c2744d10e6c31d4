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

  test("ExactSubstr index compaction: key-merged bucketed layout keeps " +
    "screen equality and deletes the index-side exchange") {
    import org.apache.spark.sql.execution.FormattedMode
    // base corpus across TWO index commits (nightly build + one daily
    // append) so compaction has duplicate keys to merge: "alpha beta
    // gamma" windows appear in both frames
    val day0 = mk(1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six")
    val day1 = mk(11L -> "alpha beta gamma delta other words",
      12L -> "unrelated text goes here today")
    val batch = mk(21L -> "alpha beta gamma delta epsilon tail",
      22L -> "nothing shared with anything else")
    val vt = VersionedTable(spark, root("ssbkt"))
    vt.overwrite(Dedup.exactSubstrIndex(day0, windowTokens = 3))
    vt.append(Dedup.exactSubstrIndex(day1, windowTokens = 3))
    val before = Dedup.exactSubstrSpansIncremental(
      batch, vt.read(), windowTokens = 3).collect().map(_.toSeq).toSet
    assert(before.nonEmpty) // doc 21 overlaps the base

    // appended frames hold the same keys twice; compaction must collapse
    // them into one dir without changing any screen
    val v = Dedup.compactSubstrIndex(vt, nBuckets = 4)
    assert(vt.manifestOf(v).dataDirs.size == 1,
      "compaction must collapse to one data dir")
    val dup = vt.read().groupBy("h1", "h2").count().filter(col("count") > 1)
    assert(dup.isEmpty, "compaction must merge duplicate keys")

    val idx = vt.readBucketed()
    // the window stamp survives the groupBy + bucketed round-trip, so the
    // screen guard still fires on a mismatched window
    assert(idx.schema("h1").metadata.getLong(Dedup.IndexWindowMetaKey) == 3L)
    val screen = Dedup.exactSubstrSpansIncremental(batch, idx, windowTokens = 3)
    assert(screen.collect().map(_.toSeq).toSet == before,
      "compaction + bucketing must be invisible to the screen")

    // the 100-TB point: with the index side bucketed on the join keys,
    // the screen's plan has NO exchange above the index scan — only the
    // day's batch shuffles. Broadcast off so the pin tests the SMJ path
    // (a tiny test index would otherwise broadcast and hide the layout).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val pinned = Dedup.exactSubstrSpansIncremental(
        batch, vt.readBucketed(), windowTokens = 3)
      val plan = pinned.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("hashpartitioning(h1#"),
        s"index side must plan exchange-free over the bucketed scan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join with broadcast disabled:\n$plan")
      assert(pinned.collect().map(_.toSeq).toSet == before)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("key-family guard: screening an index stamped with another window-" +
    "key family errors instead of silently under-flagging") {
    val day0 = mk(1L -> "alpha beta gamma delta epsilon zeta")
    val idx = Dedup.exactSubstrIndex(day0, windowTokens = 3)
    // a current-family index carries the stamp and screens fine
    assert(idx.schema("h1").metadata
      .getString(Dedup.IndexKeyFamilyMetaKey) == Dedup.SubstrKeyFamily)
    Dedup.exactSubstrSpansIncremental(mk(21L -> "alpha beta gamma tail"),
      idx, windowTokens = 3).collect()
    // the same bytes re-stamped as a FOREIGN family (what a pre-rework
    // build would have persisted) must fail the screen loudly — its keys
    // would never match, so a silent pass means missing every overlap
    val staleMeta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(Dedup.IndexWindowMetaKey, 3L)
      .putString(Dedup.IndexKeyFamilyMetaKey, "xxh64-array-v1").build()
    val stale = idx.select(col("h1").as("h1", staleMeta), col("h2"), col("cnt"))
    val e = intercept[IllegalArgumentException] {
      Dedup.exactSubstrSpansIncremental(mk(21L -> "alpha beta gamma tail"),
        stale, windowTokens = 3).collect()
    }
    assert(e.getMessage.contains("window-key family"), e.getMessage)
    // a round-trip through the persisted table keeps the stamp (parquet
    // footer + manifest schema), so the CLI's cross-build screen is covered
    val vt = VersionedTable(spark, root("ssfam"))
    vt.overwrite(idx)
    assert(vt.read().schema("h1").metadata
      .getString(Dedup.IndexKeyFamilyMetaKey) == Dedup.SubstrKeyFamily)
  }

  test("compaction CAS: a screen --append landing between the compact's " +
    "read and its commit fails the rewrite loudly instead of being erased") {
    val day0 = mk(1L -> "alpha beta gamma delta epsilon zeta")
    val vt = VersionedTable(spark, root("sscas"))
    vt.overwrite(Dedup.exactSubstrIndex(day0, windowTokens = 3))
    val head = vt.latestVersion.get
    // the interleaved append: day1's counts land AFTER the compact reads
    val day1 = mk(11L -> "alpha beta gamma delta other words")
    vt.append(Dedup.exactSubstrIndex(day1, windowTokens = 3))
    // pre-fix, the retried overwrite would commit the PRE-append merge
    // over the day's counts — a silent lost update breaking
    // index ≡ index(pinned corpus)
    val e = intercept[Exception] {
      vt.overwriteBucketed(
        vt.readVersion(head).groupBy(col("h1"), col("h2"))
          .agg(sum(col("cnt")).as("cnt")),
        nBuckets = 4, bucketCols = Seq("h1", "h2"),
        sortCols = Seq("h1", "h2"), expectedHead = Some(head))
    }
    assert(e.getMessage.contains("not the latest version"), e.getMessage)
    // nothing was lost: the day-1 counts are still the head, and a
    // re-read compact (the documented retry) succeeds and keeps them
    val expect = vt.read().groupBy("h1", "h2")
      .agg(sum("cnt").as("cnt")).collect().map(_.toSeq).toSet
    val v = Dedup.compactSubstrIndex(vt, nBuckets = 4)
    assert(vt.readVersion(v).collect().map(_.toSeq).toSet === expect,
      "re-run compaction must carry the interleaved append's counts")
  }

  test("overwrite_bucketed declines a bloom/file-stats handle instead of " +
    "silently dropping its skipping sidecars") {
    import graft.sources.VersionedTable
    val r = root("ssbloom")
    val plain = VersionedTable(spark, r)
    plain.overwrite(Dedup.exactSubstrIndex(
      mk(1L -> "alpha beta gamma delta"), windowTokens = 3))
    val bloomed = new VersionedTable(spark, r, bloomCols = Seq("h1"))
    val e = intercept[IllegalArgumentException] {
      bloomed.overwriteBucketed(bloomed.read(), nBuckets = 2,
        bucketCols = Seq("h1"))
    }
    assert(e.getMessage.contains("bloom"), e.getMessage)
  }

  test("bucketed postings index: screen bit-equal to plain and from-scratch, " +
    "with strictly fewer sg exchanges") {
    import org.apache.spark.sql.execution.FormattedMode
    val base = mk(1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five six",
      3L -> "cap cap cap cap shared shingle everywhere")
    val batch = mk(31L -> "alpha beta gamma delta zeta",
      32L -> "cap cap cap cap shared shingle everywhere")
    val vt = VersionedTable(spark, root("pbkt"))
    vt.overwriteBucketed(Dedup.postings(base, n = 3), nBuckets = 4,
      bucketCols = Seq("sg"), sortCols = Seq("sg"))
    val posts = Dedup.postings(batch, n = 3).localCheckpoint(true)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaBkt = Dedup.crossJaccardFromPostings(posts, vt.readBucketed(),
        minJaccard = 0.3)
      val viaPlain = Dedup.crossJaccardFromPostings(posts, vt.read(),
        minJaccard = 0.3)
      val fresh = Dedup.crossJaccardPairs(batch, base, n = 3,
        minJaccard = 0.3).collect().map(_.toSeq).toSet
      assert(viaBkt.collect().map(_.toSeq).toSet == fresh)
      assert(viaPlain.collect().map(_.toSeq).toSet == fresh)

      // the layout's point: the bucketed index contributes NO sg shuffle
      // (df aggregate + probe join both ride the scan's partitioning);
      // only the day's batch exchanges — strictly fewer sg exchanges
      // than the plain layout, and the bucketed scan is visibly active
      def sgExchanges(df: org.apache.spark.sql.DataFrame): Int =
        "hashpartitioning\\(sg#".r
          .findAllIn(df.queryExecution.explainString(FormattedMode)).length
      val planBkt = viaBkt.queryExecution.explainString(FormattedMode)
      assert(planBkt.contains("Bucketed: true"),
        s"bucketed scan must be active:\n$planBkt")
      assert(sgExchanges(viaBkt) < sgExchanges(viaPlain),
        s"bucketed index must delete base-side sg exchanges " +
          s"(${sgExchanges(viaBkt)} vs ${sgExchanges(viaPlain)})")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("screen at a different window than the index was built at fails " +
    "loudly instead of silently missing every overlap") {
    val vt = VersionedTable(spark, root("ssw"))
    vt.overwrite(Dedup.exactSubstrIndex(
      mk(1L -> "alpha beta gamma delta"), windowTokens = 3))
    val e = intercept[IllegalArgumentException] {
      Dedup.exactSubstrSpansIncremental(
        mk(2L -> "alpha beta gamma delta"), vt.read(), windowTokens = 4)
    }
    assert(e.getMessage.contains("windowTokens=3"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.contaminationSpansFromIndex(
        mk(2L -> "alpha beta gamma delta"), vt.read(), windowTokens = 2)
    }
    assert(e2.getMessage.contains("windowTokens=3"))
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
