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

  test("native shingle expression == retired typed form, and no stage break") {
    val docs = Tables.documents(spark, sf()).limit(200)
      .withColumn("text", when(col("doc_id") % 37 === 0, lit("one two"))
        .otherwise(col("text"))) // plant short docs: the null→drop path
    val native = Dedup.shingleSets(docs, 3)
    val typed = Dedup.shingleSetsTyped(docs, 3)
    assert(native.exceptAll(typed).isEmpty && typed.exceptAll(native).isEmpty)
    val nativeH = Dedup.shingleSetsHashed(docs, 3)
    val typedH = Dedup.shingleSetsHashedTyped(docs, 3)
    assert(nativeH.exceptAll(typedH).isEmpty &&
      typedH.exceptAll(nativeH).isEmpty)
    // the point of the expression: the shingling stage stays inside
    // whole-stage codegen — no object-boundary operators in the plan
    val plan = native.queryExecution.executedPlan.toString
    assert(!plan.contains("MapPartitions") &&
      !plan.contains("DeserializeToObject"), s"stage break in:\n$plan")
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

  test("simhashFast == expression simhash == native simhash (sync guard)") {
    val docs = Tables.documents(spark, sf()).limit(100)
    val fast = Dedup.simhashFast(docs, 32)
    val expr = Dedup.simhash(docs, 32)
    val native = Dedup.simhashNative(docs, 32)
    assert(fast.exceptAll(expr).isEmpty && expr.exceptAll(fast).isEmpty)
    assert(fast.exceptAll(native).isEmpty && native.exceptAll(fast).isEmpty)
    // the weighted variant's twins stay in sync too
    val wFast = Dedup.simhashFast(docs, 32, weighted = true)
    val wNative = Dedup.simhashNative(docs, 32, weighted = true)
    assert(wFast.exceptAll(wNative).isEmpty && wNative.exceptAll(wFast).isEmpty)
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

  test("canonicalize maps every doc to its cluster's best-quality copy") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    // docs 1/2/3 near-identical (one cluster), 10 unrelated (singleton);
    // doc 2 carries extra distinct tokens → highest quality in-cluster
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, base),
      (2L, base + " too"),
      // stopword-heavy tail: the quality formula's dominant term is the
      // stopword ratio, so this member outranks the oldest copy
      (3L, base + " and the fox is in the field and it is a good dog"),
      (10L, "completely unrelated text about streaming engines and parquet files")
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.canonicalize(d, minJaccard = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 10L))
    assert(out(10L) == (10L, 10L)) // singleton is its own canonical
    val cluster = Set(1L, 2L, 3L).map(out(_)._1)
    assert(cluster.size == 1 && cluster.head == 1L) // min-label cluster id
    // the representative is the argmax of the SAME quality function the
    // operator uses (ties id-ascending)…
    import graft.functions.TextFunctions
    val q = d.select(col("doc_id"),
        round(TextFunctions.qualityScore(TextFunctions.tokens(col("text"))), 6)
          .as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Seq(1L, 2L, 3L).maxBy(id => (q(id), -id))
    assert(Seq(1L, 2L, 3L).forall(id => out(id)._2 == expected))
    // …and in this fixture that is the stopword-heavy doc 3, NOT the
    // oldest copy — canonicalize beats keep-first on quality
    assert(expected == 3L)
  }

  test("canonicalize: quality ties break to MIN doc_id deterministically") {
    import spark.implicits._
    import graft.operators.CorpusPipeline
    // identical texts → one cluster with EQUAL quality everywhere: the
    // argmax struct negates ONLY quality (a double), so the tie falls to
    // the minimum doc_id in the id's native order — negating the id
    // itself would be ANSI-hostile for non-numeric ids and was the old
    // spelling's latent hazard
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq((9L, t), (3L, t), (5L, t)).toDF("doc_id", "text")
    val out = CorpusPipeline.canonicalize(d, minJaccard = 0.3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(3L, 5L, 9L))
    assert(out.values.toSet == Set(3L))
  }

  test("exactSubstr: cross-doc and within-doc duplicated spans, merged maximally") {
    import spark.implicits._
    val d = Seq(
      // docs 1 and 2 share the verbatim 8-token passage "a b … h"
      (1L, "c0 a b c d e f g h t1 t2 t3"),
      (2L, "z0 z1 a b c d e f g h"),
      // doc 3 repeats its own 6-token prefix — the paper's
      // any-second-occurrence rule counts within-doc repeats
      (3L, "p q r s t u p q r s t u x"),
      (4L, "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(d, windowTokens = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans == Set(
      (1L, 1L, 9L, 8L),   // exactly the shared passage, not the whole doc
      (2L, 2L, 10L, 8L),
      (3L, 0L, 12L, 12L)  // the two repeats overlap-merge into one span
    ), spans.toString)
    val stats = Dedup.exactSubstrStats(d, windowTokens = 5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(stats(1L) == ((12L, 1L, 8L, 0.666667)))
    assert(stats(4L) == ((6L, 0L, 0L, 0.0))) // spanless docs still report
  }

  test("exactSubstr plan: no occurrence-frame checkpoint, binary window keys") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    // DEFAULT (100-TB-safe): the w×-corpus occurrence frame is NOT
    // materialized (a localCheckpoint would surface as a LogicalRDD scan
    // in the analyzed plan — at that scale the checkpoint is ~w× the
    // token stream), and the window key comes from the ONE native
    // rolling-hash expression (r15: graft_substr_windows — per-token
    // hashing + O(1) rolling windows, 16 bytes on the shuffle wire),
    // never an md5 hex string and never the interpreted
    // transform/slice/xxhash64 higher-order chain
    for (df <- Seq(Dedup.exactSubstrSpans(d, windowTokens = 3),
                   Dedup.contaminationSpans(d, d, windowTokens = 3),
                   Dedup.exactSubstrStats(d, windowTokens = 3),
                   Dedup.exactSubstrRedact(d, windowTokens = 3))) {
      val plan = df.queryExecution.analyzed.toString
      assert(!plan.contains("LogicalRDD"), "occurrence frame checkpointed")
      assert(plan.contains("graft_substr_windows"),
        "window key is not the native rolling-hash expression")
      assert(!plan.contains("md5"), "window key must not pay md5")
    }
    // under the SMALL-CORPUS opt-in the frame IS shared (one explode
    // pass feeds both consumers), with identical output
    val dflt = Dedup.exactSubstrSpans(d, windowTokens = 3).collect().toSet
    spark.conf.set(Dedup.SubstrMaterializeConf, "true")
    try {
      val mat = Dedup.exactSubstrSpans(d, windowTokens = 3)
      assert(mat.queryExecution.analyzed.toString.contains("LogicalRDD"),
        "opt-in must materialize the occurrence frame once")
      assert(mat.collect().toSet === dflt)
    } finally spark.conf.unset(Dedup.SubstrMaterializeConf)
  }

  test("graft_substr_windows ≡ the higher-order window chain it replaced") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    // whitespace zoo: tabs/newlines/CR/FF/VT, runs, leading/trailing,
    // multi-byte UTF-8 (never ASCII whitespace), empty/short/null docs —
    // token BOUNDARIES and POSITIONS must match split("\\s+") exactly
    // because positions reach the span output
    val docs = Seq(
      (1L, "a b c d e"), (2L, "  a\tb\nc\rde\ff  "),
      (3L, "héllo wörld añd ünïcode tökens here"),
      (4L, "one two"), (5L, ""), (6L, null.asInstanceOf[String]),
      (7L, "x x x x x x x x"), (8L, "a  b   c    d     e"))
      .toDF("doc_id", "text")
    val w = 3
    val native = docs.select(col("doc_id"),
        explode(call_function("graft_substr_windows", col("text"), lit(w)))
          .as("e"))
      .select(col("doc_id"), col("e.pos").as("pos"),
        col("e.h1").as("h1"), col("e.h2").as("h2"))
    val toks = TextFunctions.tokens(col("text"))
    val twin = docs.select(col("doc_id"),
        when(size(toks) >= w, transform(sequence(lit(0), size(toks) - w),
          i => slice(toks, i + 1, lit(w))))
          .otherwise(array().cast("array<array<string>>")).as("ws"))
      .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "wt")))
    // positions identical to the retired chain
    assert(native.select("doc_id", "pos").exceptAll(
      twin.select("doc_id", "pos")).isEmpty)
    assert(twin.select("doc_id", "pos").exceptAll(
      native.select("doc_id", "pos")).isEmpty)
    // key CONTRACT: equal window text ⇔ equal (h1, h2) — the rolling
    // polynomial must key on content, not position (doc 7's repeated
    // windows collapse to one key; distinct windows stay distinct here)
    val joined = native.join(twin, Seq("doc_id", "pos"))
      .select(concat_ws(" ", col("wt")).as("txt"), col("h1"), col("h2"))
    assert(joined.select("txt", "h1", "h2").distinct().count() ===
      joined.select("txt").distinct().count())
    assert(joined.select("h1", "h2").distinct().count() ===
      joined.select("txt").distinct().count())
  }

  test("exactSubstrRedact cuts exactly the spans; token conservation holds") {
    import spark.implicits._
    val d = Seq(
      (1L, "c0 a b c d e f g h t1 t2 t3"),
      (2L, "z0 z1 a b c d e f g h"),
      (3L, "p q r s t u p q r s t u x"),
      (4L, "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrRedact(d, windowTokens = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // spans from the sibling test: doc1 [1,9), doc2 [2,10), doc3 [0,12)
    assert(out(1L) == (("c0 t1 t2 t3", 12L, 4L, 8L)))
    assert(out(2L) == (("z0 z1", 10L, 2L, 8L)))
    assert(out(3L) == (("x", 13L, 1L, 12L)))
    assert(out(4L) == (("u1 u2 u3 u4 u5 u6", 6L, 6L, 0L))) // untouched
    // conservation: kept + removed = n_tokens, and removed matches the
    // stats rollup's dup_tokens for every doc
    val stats = Dedup.exactSubstrStats(d, windowTokens = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out.foreach { case (id, (_, n, k, rm)) =>
      assert(k + rm == n, s"doc $id leaks tokens")
      assert(rm == stats(id), s"doc $id removed != dup_tokens")
    }
  }

  test("incremental substr screen == full-corpus spans restricted to new docs") {
    import spark.implicits._
    val base = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      // duplicates base doc 1's passage → flagged against the INDEX
      (10L, "x1 x2 a b c d e f g x3"),
      // duplicated only WITHIN the new batch → flagged by batch counts
      (11L, "y1 w1 w2 w3 w4 w5 y2"),
      (12L, "z1 w1 w2 w3 w4 w5 z2"),
      (13L, "u1 u2 u3 u4 u5 u6 u7") // clean
    ).toDF("doc_id", "text")
    val idx = Dedup.exactSubstrIndex(base, windowTokens = 5)
    // additivity: an append-only index (two half-frames) screens the same
    val idxSplit = Dedup.exactSubstrIndex(base.filter(col("doc_id") === 1L),
        windowTokens = 5)
      .unionAll(Dedup.exactSubstrIndex(base.filter(col("doc_id") === 2L),
        windowTokens = 5))
    for (index <- Seq(idx, idxSplit)) {
      val inc = Dedup.exactSubstrSpansIncremental(fresh, index,
        windowTokens = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val full = Dedup.exactSubstrSpans(base.unionAll(fresh), windowTokens = 5)
        .filter(col("doc_id") >= 10L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(inc === full, s"differential broke: inc=$inc full=$full")
      assert(inc.map(_._1) === Set(10L, 11L, 12L), inc.toString)
    }
    // the persisted-ref decon screen == re-hashing the refs directly
    val refIdx = Dedup.exactSubstrIndex(base, windowTokens = 5)
    val viaIdx = Dedup.contaminationSpansFromIndex(fresh, refIdx,
      windowTokens = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Dedup.contaminationSpans(fresh, base, windowTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIdx === direct, s"idx=$viaIdx direct=$direct")
    assert(viaIdx.map(_._1) === Set(10L), // only the base-overlap doc
      viaIdx.toString)
  }

  test("exactSubstr property: operator == brute-force reference on random corpora") {
    import spark.implicits._
    // deterministic pseudo-random corpora over a small alphabet (so
    // duplicated windows actually occur), checked against a plain-Scala
    // reference: windows by position, count multiset, flag >1, islands
    // with the gap-> w rule — edge docs (len < w, len == w) included
    val rnd = new scala.util.Random(20260816L)
    def randDoc(maxLen: Int): String =
      Seq.fill(rnd.nextInt(maxLen + 1))("t" + rnd.nextInt(7)).mkString(" ")
    def reference(docs: Seq[(Long, String)], w: Int): Set[(Long, Long, Long)] = {
      val occ = docs.flatMap { case (id, text) =>
        val toks = text.split("\\s+").filter(_.nonEmpty)
        (0 to toks.length - w).map(i =>
          (id, i, toks.slice(i, i + w).mkString(" ")))
      }
      val counts = occ.groupBy(_._3).view.mapValues(_.size).toMap
      occ.filter(o => counts(o._3) > 1).groupBy(_._1).flatMap {
        case (id, os) =>
          val ps = os.map(_._2).sorted
          val spans = scala.collection.mutable.ListBuffer.empty[(Int, Int)]
          for (p <- ps) spans.lastOption match {
            case Some((s0, pPrev)) if p - pPrev <= w =>
              spans.update(spans.length - 1, (s0, p))
            case _ => spans += ((p, p))
          }
          spans.map { case (s0, pLast) =>
            (id, s0.toLong, (pLast + w).toLong) }
      }.toSet
    }
    for (trial <- 1 to 3; w <- Seq(2, 3, 5)) {
      val docs = (1L to 30L).map(i => (i * 100 + trial, randDoc(14)))
      val got = Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"),
          windowTokens = w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = reference(docs, w)
      assert(got === want,
        s"trial=$trial w=$w:\n extra=${got -- want}\n missing=${want -- got}")
    }
  }

  test("contaminationSpans reports WHERE the eval text leaked, nothing more") {
    import spark.implicits._
    val eval = Seq((100L, "q1 q2 q3 q4 q5 q6 q7")).toDF("doc_id", "text")
    val train = Seq(
      // contains the 7-token eval passage mid-document
      (1L, "pre1 pre2 q1 q2 q3 q4 q5 q6 q7 post1 post2"),
      (2L, "clean text with no benchmark overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(train, eval, windowTokens = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // exactly the leaked passage (tokens 2..8), never the whole doc, and
    // the clean doc reports nothing
    assert(spans == Set((1L, 2L, 9L, 7L)), spans.toString)
  }

  test("exact dedup keeps one row per normalized text") {
    val docs = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "different")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L)) // min doc_id wins within a fingerprint group
  }

  test("crossJaccardPairs == self-join pairs restricted to cross pairs") {
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f h"),      // near-dup of 1
      (7L, "a b c d e f g"),      // new batch: exact dup of 1
      (17L, "x y z w v u t"),     // new batch: unique
      (3L, "x y z w v u t s"),    // near-dup of 17
      (27L, "a b c d e f h")      // new batch: dup of 2 AND near 7
    ).toDF("doc_id", "text")
    val isNew = col("doc_id") % 10 === 7
    val got = Dedup.crossJaccardPairs(docs.filter(isNew),
        docs.filter(!isNew), n = 3, minJaccard = 0.5,
        maxShingleFreq = None)
      .select("new_id", "base_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val expected = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5,
        maxShingleFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => (a % 10 == 7) != (b % 10 == 7) }
      .map { case (a, b, j) =>
        if (a % 10 == 7) (a, b, j) else (b, a, j) }.toSet
    assert(got == expected)
    assert(got.nonEmpty) // the fixture must actually produce cross pairs
    // never a base×base or new×new pair
    assert(got.forall { case (n, b, _) => n % 10 == 7 && b % 10 != 7 })
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
