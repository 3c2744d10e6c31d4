package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

import graft.functions.TextFunctions

/** Deduplication operators for a training-data pipeline, each designed
  * around its shuffle profile at 100 TB:
  *
  *   - [[exact]]: one hash-aggregate on a 128-bit fingerprint — the only
  *     shuffle key is the fingerprint itself, so skew equals true duplicate
  *     skew (cap with a per-key limit upstream if a single doc explodes).
  *   - [[ngramJaccardPairs]]: inverted-index self-join on shingles. The
  *     candidate space is bounded by shingle co-occurrence, not n²; hot
  *     shingles are the skew risk — `maxShingleFreq` drops
  *     stop-shingles (appearing in more docs than the cap) before the join,
  *     the standard scale lever.
  *   - [[minhashLshPairs]]: signatures are computed in the shingling pass
  *     (no shuffle), then candidates come from an equi-join on (band,
  *     band-hash) — k min hashes, b bands of r rows ⇒ P(candidate) =
  *     1-(1-j^r)^b. Verification re-joins the shingle sets only for
  *     candidate pairs.
  *   - [[simhashPairs]]: 32-bit SimHash per doc (computed in the tokenize
  *     pass), candidate pairs via 4×8-bit band equi-join (Hamming ≤ 3
  *     guarantees a matching band — pigeonhole), verified with
  *     bit_count(xor).
  *   - [[groupMinhashSimilarity]]: mergeable corpus-level sketch — min
  *     aggregation IS the merge; group pairs come from a (slot, value)
  *     equi-join (1-slot LSH bands, lossless for est > 0), never an
  *     all-pairs join over groups².
  *
  * All hashes are md5-derived and identical in the DuckDB oracles.
  */
object Dedup {

  /** Exact duplicate groups by normalized-text fingerprint. */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs
      .groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** One row per unique normalized text, keeping the smallest id.
    *
    * Executes as a `min_by` hash aggregate, NOT a per-fingerprint
    * window: exact-dup groups are the most skewed key in a web corpus
    * (one boilerplate page can repeat millions of times), and a window
    * partitioned by fingerprint funnels each giant group through one
    * task — the aggregate partial-combines map-side so the winner per
    * group is reduced before the shuffle. Ids are unique, so min_by's
    * tie behavior never engages.
    */
  def exact(docs: DataFrame, textCol: String = "text",
            idCol: String = "doc_id"): DataFrame = {
    val cols = docs.columns.toSeq
    docs
      .groupBy(TextFunctions.fingerprint(col(textCol)).as("_fp"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("_row"))
      .select(cols.map(c => col(s"_row.`$c`").as(c)): _*)
  }

  /** (doc_id, shingles) prep: distinct word n-gram shingles.
    *
    * Computed by the native codegen'd expression
    * ([[graft.plans.ShinglesExpr]], `graft_shingles`): the tokenize +
    * slide + distinct pipeline runs INSIDE whole-stage codegen, where the
    * earlier typed `mapPartitions` broke the stage at both edges on BOTH
    * sides of every dedup self-join, and the higher-order-expression
    * chain ([[TextFunctions.shingles]], still the semantics twin) paid
    * ~1.2 ms/doc interpreted. Docs with fewer than `n` tokens yield NULL
    * from the expression and are filtered — the mapPartitions form's row
    * drop. All three forms are pinned byte-equal in DedupSpec.
    */
  def shingleSets(docs: DataFrame, n: Int,
                  textCol: String = "text", idCol: String = "doc_id",
                  spread: Boolean = false): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    // `spread` fans the projected (id, text) out of an under-parallel scan
    // (guide §2.5; see ScanParallel) — opt-in per CONSUMER: the native
    // shingle expression itself is µs/doc, so the extra exchange only pays
    // off when the DOWNSTREAM of a materialized shingle frame does heavy
    // per-row work that would otherwise inherit the scan's 1-partition
    // layout (the MinHash signature transforms); measured a net LOSS on
    // the explode→join consumers (jaccard/containment/clean), which stay
    // un-spread
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(col(textCol), lit("")).as("_sh_t"))
    val in = if (spread) ScanParallel.fanOut(base, Seq(col("doc_id"))) else base
    in.select(col("doc_id"),
        call_function(graft.plans.GraftFunctions.shinglesName,
          col("_sh_t"), lit(n), lit(false)).as("sh"))
      .filter(col("sh").isNotNull)
  }

  /** The retired typed form of [[shingleSets]] — kept as the
    * differential twin DedupSpec pins the native expression against.
    */
  private[graft] def shingleSetsTyped(docs: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = Option(text).getOrElse("")
            .split("\\s+").iterator.filter(_.nonEmpty).toArray
          if (toks.length < n) Iterator.empty
          else Iterator.single(
            (id, toks.sliding(n).map(_.mkString(" ")).toArray.distinct))
        }
      }
      .toDF("doc_id", "sh")
  }

  /** First 4 bytes of md5 as an unsigned 32-bit value — equal to
    * `('0x' || substring(md5(s), 1, 8))::BIGINT` in the oracle and to
    * [[baseHash32]] as an expression.
    */
  private def md5Prefix32(md: java.security.MessageDigest, s: String): Long = {
    val h = md.digest(s.getBytes("UTF-8"))
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** (doc_id, sh, hs): shingles plus their 32-bit base hashes, one md5 per
    * shingle, computed alongside the shingling pass — the `withHashes`
    * mode of the native expression ([[graft.plans.ShinglesExpr]]).
    */
  def shingleSetsHashed(docs: DataFrame, n: Int,
                        textCol: String = "text", idCol: String = "doc_id",
                        spread: Boolean = false): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    // same per-consumer `spread` contract as [[shingleSets]]
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(col(textCol), lit("")).as("_sh_t"))
    val in = if (spread) ScanParallel.fanOut(base, Seq(col("doc_id"))) else base
    in.select(col("doc_id"),
        call_function(graft.plans.GraftFunctions.shinglesName,
          col("_sh_t"), lit(n), lit(true)).as("_s"))
      .filter(col("_s").isNotNull)
      .select(col("doc_id"), col("_s.sh").as("sh"), col("_s.hs").as("hs"))
  }

  /** The retired typed form of [[shingleSetsHashed]] — kept as the
    * differential twin DedupSpec pins the native expression against.
    */
  private[graft] def shingleSetsHashedTyped(docs: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val toks = Option(text).getOrElse("")
            .split("\\s+").iterator.filter(_.nonEmpty).toArray
          if (toks.length < n) Iterator.empty
          else {
            val sh = toks.sliding(n).map(_.mkString(" ")).toArray.distinct
            Iterator.single((id, sh, sh.map(md5Prefix32(md, _))))
          }
        }
      }
      .toDF("doc_id", "sh", "hs")
  }

  /** Production default for the hot-shingle cap: drop shingles held by more
    * than this many docs before the inverted-index join. Sized to ~1% of
    * the test corpus; in production set it as an absolute ceiling on
    * acceptable candidate fan-out (a shingle in k docs contributes up to
    * k²/2 candidate pairs — df 10k ⇒ 5·10⁷ pairs from ONE stop-shingle).
    * Capping biases reported Jaccard LOW, never high: intersections are
    * counted post-cap while set sizes stay pre-cap, so a pair sharing a
    * dropped stop-shingle under-counts `inter` — the cap can lose near-dup
    * pairs (or deflate their score below the threshold) but cannot invent
    * one. The oracle mirrors the cap, so tests compare like-for-like.
    */
  val defaultShingleCap: Option[Int] = Some(5)

  /** All pairs (a < b) with n-gram Jaccard ≥ `minJaccard`, via
    * inverted-index join. The hot-shingle cap is ON by default (the scale
    * lever, see [[defaultShingleCap]]); pass None for the exact uncapped
    * variant (recall baseline / calibration only).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
                        maxShingleFreq: Option[Int] = defaultShingleCap): DataFrame =
    ngramPairCounts(docs, n, maxShingleFreq)
      .withColumn("jaccard",
        col("inter") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))

  /** All pairs (a < b) with n-gram CONTAINMENT — |A∩B| / min(|A|,|B|) — at
    * or above `minContainment`. Jaccard misses subset duplication (a doc
    * pasted whole into a larger one scores |A|/|B|, arbitrarily low);
    * min-normalized containment scores it 1.0, which is what quote-chain
    * and boilerplate-inclusion dedup actually want. Same inverted-index +
    * hot-shingle-cap shape (and LOW-bias cap semantics) as Jaccard.
    */
  def ngramContainmentPairs(docs: DataFrame, n: Int, minContainment: Double,
                            maxShingleFreq: Option[Int] = defaultShingleCap): DataFrame =
    ngramPairCounts(docs, n, maxShingleFreq)
      .withColumn("containment", col("inter") / least(col("sa"), col("sb")))
      .filter(col("containment") >= minContainment)
      .select(col("a"), col("b"),
        round(col("containment"), 6).as("containment"))

  /** Candidate pairs (a < b) with shingle-set sizes and intersection count
    * — the shared inverted-index stage behind Jaccard and containment
    * scoring.
    */
  private def ngramPairCounts(docs: DataFrame, n: Int,
                              maxShingleFreq: Option[Int]): DataFrame = {
    // materialize the shingling pass ONCE: it feeds the hot-shingle agg and
    // BOTH sides of the self-join, and Spark re-executes a lazy subtree per
    // occurrence (4 tokenize+shingle passes without this). MEMORY_AND_DISK
    // blocks, GC-reclaimed; at corpus scales beyond cluster storage, stage
    // the frame to a parquet table instead.
    val sh = SharedPass.materialize(shingleSets(docs, n))
    val ex0 = sh.select(col("doc_id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("sg"))
    val ex = maxShingleFreq match {
      case Some(cap) =>
        val hot = ex0.groupBy("sg").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sg")
        ex0.join(broadcast(hot), Seq("sg"), "left_anti")
      case None => ex0
    }
    val a = ex.select(col("doc_id").as("a"), col("sz").as("sa"), col("sg"))
    val b = ex.select(col("doc_id").as("b"), col("sz").as("sb"), col("sg"))
    a.join(b, Seq("sg")).filter(col("a") < col("b"))
      .groupBy("a", "b", "sa", "sb")
      .agg(count(lit(1)).as("inter"))
  }

  /** Incremental (cross-corpus) near-dup pairs: every (new, base) doc
    * pair with n-gram Jaccard ≥ `minJaccard` — the production dedup
    * shape, where a new crawl batch screens AGAINST the accumulated
    * corpus instead of re-deduping the world. Same inverted shingle
    * index, but the join is strictly new-side × base-side: base×base
    * candidates (the quadratic bulk — the base was already deduped)
    * never form. The hot-shingle cap counts document frequency over the
    * UNION, so a shingle hot in the base also caps the new side and the
    * self-dedup's LOW-bias cap semantics carry over unchanged.
    *
    * Scale shape: candidate mass is Σ_sg df_new(sg)·df_base(sg) —
    * linear in the (small) new batch for capped df, never |base|². The
    * base side streams through one equi-join on the shingle key; AQE
    * broadcasts the new side when the batch is small.
    */
  def crossJaccardPairs(newDocs: DataFrame, baseDocs: DataFrame, n: Int,
                        minJaccard: Double,
                        maxShingleFreq: Option[Int] = defaultShingleCap): DataFrame =
    crossPairCounts(newDocs, baseDocs, n, maxShingleFreq)
      .withColumn("jaccard",
        col("inter") / (col("sn") + col("sb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("new_id"), col("base_id"),
        round(col("jaccard"), 6).as("jaccard"))

  /** Containment twin of [[crossJaccardPairs]] — |new∩base| / min sizes:
    * the quote-chain case at ingest (a new doc wholly pasted from a base
    * doc scores Jaccard |new|/|base|, arbitrarily low; min-normalized
    * containment scores it 1.0). Same asymmetric index, same cap
    * semantics.
    */
  def crossContainmentPairs(newDocs: DataFrame, baseDocs: DataFrame, n: Int,
                            minContainment: Double,
                            maxShingleFreq: Option[Int] = defaultShingleCap): DataFrame =
    crossPairCounts(newDocs, baseDocs, n, maxShingleFreq)
      .withColumn("containment",
        col("inter") / least(col("sn"), col("sb")))
      .filter(col("containment") >= minContainment)
      .select(col("new_id"), col("base_id"),
        round(col("containment"), 6).as("containment"))

  /** Inverted-index postings of a corpus: one row per (doc, distinct
    * shingle) with the doc's shingle-set size riding along — the frame a
    * PERSISTED dedup index stores, so tomorrow's batch screens against
    * yesterday's postings without reshingling the base corpus
    * (`dedup_index_screen`). Callers reusing the frame should
    * materialize it (`localCheckpoint`) — a table read already is.
    */
  def postings(docs: DataFrame, n: Int): DataFrame =
    shingleSets(docs, n)
      .select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("sg"))

  /** [[crossJaccardPairs]] over PRECOMPUTED posting frames — the
    * screen-from-persisted-index path. Hot-shingle cap semantics are
    * identical: df counts over the UNION of both frames.
    */
  def crossJaccardFromPostings(exNew0: DataFrame, exBase0: DataFrame,
                               minJaccard: Double,
                               maxShingleFreq: Option[Int] = defaultShingleCap): DataFrame =
    crossPairCountsFromPostings(exNew0, exBase0, maxShingleFreq)
      .withColumn("jaccard",
        col("inter") / (col("sn") + col("sb") - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("new_id"), col("base_id"),
        round(col("jaccard"), 6).as("jaccard"))

  /** Shared asymmetric inverted-index stage: (new_id, base_id, sn, sb,
    * inter) — see [[crossJaccardPairs]] for the scale argument.
    */
  private def crossPairCounts(newDocs: DataFrame, baseDocs: DataFrame,
                              n: Int,
                              maxShingleFreq: Option[Int]): DataFrame =
    crossPairCountsFromPostings(
      SharedPass.materialize(postings(newDocs, n)),
      SharedPass.materialize(postings(baseDocs, n)), maxShingleFreq)

  private def crossPairCountsFromPostings(exNew0: DataFrame,
                                          exBase0: DataFrame,
                                          maxShingleFreq: Option[Int]): DataFrame = {
    val (exNew, exBase) = maxShingleFreq match {
      case Some(cap) =>
        // df over the union, spelled as per-side aggregates joined and
        // SUMMED (identical counts — additivity): the union spelling
        // destroyed any partitioning the base frame carried, forcing a
        // full base-postings shuffle per screen; per-side aggregation
        // lets a BUCKETED persisted index (X370 — `dedup-index build`
        // writes postings bucketed on sg) aggregate AND join with no
        // exchange on the base side, so only the day's batch shuffles.
        // Full outer: a shingle past the cap within one side alone must
        // cap both sides, exactly as the union count did.
        val dfNew = exNew0.groupBy("sg").agg(count(lit(1)).as("_dfn"))
        val dfBase = exBase0.groupBy("sg").agg(count(lit(1)).as("_dfb"))
        val hot = dfBase.join(dfNew, Seq("sg"), "full_outer")
          .filter(coalesce(col("_dfb"), lit(0L)) +
            coalesce(col("_dfn"), lit(0L)) > cap)
          .select("sg")
        (exNew0.join(broadcast(hot), Seq("sg"), "left_anti"),
          exBase0.join(broadcast(hot), Seq("sg"), "left_anti"))
      case None => (exNew0, exBase0)
    }
    exNew.select(col("doc_id").as("new_id"), col("sz").as("sn"),
        col("sg"))
      .join(exBase.select(col("doc_id").as("base_id"),
        col("sz").as("sb"), col("sg")), Seq("sg"))
      .groupBy("new_id", "base_id", "sn", "sb")
      .agg(count(lit(1)).as("inter"))
  }

  /** 32-bit base hash of a shingle (first 8 hex chars of md5) — md5 runs
    * ONCE per shingle; the k min-hash functions are derived arithmetically
    * (universal hashing), which is ~k× cheaper than k seeded md5 passes and
    * identically expressible in the oracle.
    */
  def baseHash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Universal-hash family over the 32-bit base hash: (a_i·h + b_i) mod p.
    * a_i odd, p = 2^31-1; products stay < 2^63.
    */
  def universalHash(i: Int, h: Column): Column =
    (h * lit(uhA(i)) + lit(uhB(i))) % lit(2147483647L)

  def uhA(i: Int): Long = 2L * i + 1001L
  def uhB(i: Int): Long = 12289L * (i + 1)

  /** MinHash+LSH near-dup pairs: k min-hashes, `bands` bands of k/bands
    * rows; banded candidates verified against true Jaccard ≥ `minJaccard`.
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, k: Int = 16,
                      bands: Int = 8, minJaccard: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    // one materialized shingling pass feeds the signatures AND both
    // verification sides (3 recomputations otherwise — see ngramJaccardPairs)
    // spread=true: the k per-signature array transforms downstream run on
    // the CHECKPOINT's partitioning — from a single-row-group scan that
    // was ONE task for all k·|docs| interpreted transforms (measured 2×
    // on the minhash headline; see shingleSets' spread contract)
    val sh = SharedPass.materialize(shingleSetsHashed(docs, n, spread = true))
    val sigCols = (0 until k).map(i =>
      array_min(F.transform(col("hs"), h => universalHash(i, h))).as(s"h$i"))
    val sig = sh.select(col("doc_id") +: sigCols: _*)
    val bandStructs = (0 until bands).map { bi =>
      struct(lit(bi).as("band"),
        md5(concat_ws(",",
          (0 until rows).map(r => col(s"h${bi * rows + r}")): _*)).as("bh"))
    }
    val banded = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val sa = sh.select(col("doc_id").as("a"), col("sh").as("sha"))
    val sb = sh.select(col("doc_id").as("b"), col("sh").as("shb"))
    cand.join(sa, "a").join(sb, "b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sha")) + size(col("shb")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 60-bit token hash: first 15 hex chars of md5 = first 8 bytes as an
    * unsigned big-endian long shifted right 4 — equal to
    * [[TextFunctions.tokenHash]] and the oracle's hex cast.
    */
  private def md5Prefix60(md: java.security.MessageDigest, s: String): Long = {
    val h = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
    v >>> 4
  }

  /** SimHash computed in the tokenize pass (one md5 + one bit loop per
    * distinct token) — same value as [[simhash]]'s expression form, which
    * costs `bits` interpreted filter passes per row. Pinned equal in
    * DedupSpec.
    */
  def simhashFast(docs: DataFrame, bits: Int = 32,
                  textCol: String = "text", idCol: String = "doc_id",
                  weighted: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val all = Option(text).getOrElse("")
            .split("\\s+").iterator.filter(_.nonEmpty).toArray
          // unweighted (classic token-SET SimHash, the oracled default)
          // votes ±1 per DISTINCT token; weighted votes ±tf, so documents
          // sharing a vocabulary but differing in term frequency separate
          // — the fix for set-SimHash's blindness on small shared vocabs
          val weightsByTok: Iterator[(String, Int)] =
            if (weighted) all.groupBy(identity).iterator.map { case (t, g) => (t, g.length) }
            else all.distinct.iterator.map((_, 1))
          val votes = new Array[Int](bits)
          weightsByTok.foreach { case (t, w) =>
            val h = md5Prefix60(md, t)
            var j = 0
            while (j < bits) {
              votes(j) += (if (((h >>> j) & 1L) == 1L) w else -w)
              j += 1
            }
          }
          var sim = 0L
          var j = 0
          while (j < bits) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
          (id, sim)
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** Corpus-level sketch analytics: per-`groupCol` MinHash signatures built
    * by MIN-aggregating shingle hashes — the aggregation IS the sketch
    * merge (min is associative/commutative), so signatures combine
    * map-side, shuffle one row per (group, k), and two groups' Jaccard is
    * estimated as the fraction of agreeing signature slots.
    *
    * Pair generation is an EQUI-join, never all-pairs: each signature
    * explodes into k (slot, value) rows and pairs come from matching
    * (slot, value) — i.e. LSH banding with 1-slot bands, which is lossless
    * here because a pair agreeing on zero slots has est_jaccard exactly 0
    * and is omitted from the output (the dense groups² matrix is
    * intractable at high-cardinality `groupCol`; the sparse est>0 matrix
    * is the scale design). Skew: a slot value shared by m groups fans out
    * m²/2 — that is true cluster mass, and AQE skew-split applies since
    * the join is equi.
    *
    * The exact shingle-set Jaccard is emitted alongside for calibration,
    * gated behind `calibrateMaxGroups` (group-cardinality threshold; 0
    * disables without counting): the exact side shuffles every distinct
    * (group, shingle) pair, affordable at dashboard grain (hundreds of
    * sources) but not at millions of groups — uncalibrated output carries
    * exact_jaccard = NULL rather than a fake 0. Pairs whose shingle sets
    * overlap but whose signatures agree nowhere (est 0, exact > 0) surface
    * through the calibration side's full-outer merge.
    */
  def groupMinhashSimilarity(docs: DataFrame, groupCol: String,
                             n: Int = 3, k: Int = 16,
                             calibrateMaxGroups: Int = 10000): DataFrame = {
    val withGroup = shingleSetsHashed(docs, n)
      .join(docs.select(col("doc_id"), col(groupCol).as("grp")), "doc_id")
      .localCheckpoint(true) // feeds the sketch AND the exact calibration side
    // sketch: min per slot over every shingle hash in the group
    val exploded = withGroup.select(col("grp"), explode(col("hs")).as("h"))
    val sigAggs = (0 until k).map(i =>
      min(universalHash(i, col("h"))).as(s"h$i"))
    val sigs = exploded.groupBy("grp").agg(sigAggs.head, sigAggs.tail: _*)
      .localCheckpoint(true) // one row per group; feeds gate + both join sides
    val slots = sigs.select(col("grp"), explode(array((0 until k).map(i =>
        struct(lit(i).as("slot"), col(s"h$i").as("v"))): _*)).as("s"))
      .select(col("grp"), col("s.slot").as("slot"), col("s.v").as("v"))
    val sketchPairs = slots.as("x")
      .join(slots.as("y"),
        col("x.slot") === col("y.slot") && col("x.v") === col("y.v") &&
          col("x.grp") < col("y.grp"))
      .groupBy(col("x.grp").as("g1"), col("y.grp").as("g2"))
      .agg(count(lit(1)).as("agree"))
      .select(col("g1"), col("g2"),
        round(col("agree") / k.toDouble, 6).as("est_jaccard"))
    val calibrate = calibrateMaxGroups > 0 &&
      sigs.limit(calibrateMaxGroups + 1).count() <= calibrateMaxGroups
    if (!calibrate)
      return sketchPairs.withColumn("exact_jaccard", lit(null).cast("double"))
    // exact: distinct shingle sets per group (inverted-index equi-join on sg)
    val distinctSh = withGroup
      .select(col("grp"), explode(col("sh")).as("sg")).distinct()
    val sizes = distinctSh.groupBy("grp").agg(count(lit(1)).as("sz"))
    val inter = distinctSh.as("x").join(distinctSh.as("y"),
        col("x.sg") === col("y.sg") && col("x.grp") < col("y.grp"))
      .groupBy(col("x.grp").as("g1"), col("y.grp").as("g2"))
      .agg(count(lit(1)).as("inter"))
    val exact = inter
      .join(sizes.select(col("grp").as("g1"), col("sz").as("s1")), "g1")
      .join(sizes.select(col("grp").as("g2"), col("sz").as("s2")), "g2")
      .select(col("g1"), col("g2"),
        round(col("inter") / (col("s1") + col("s2") - col("inter")), 6)
          .as("exact_jaccard"))
    sketchPairs.join(exact, Seq("g1", "g2"), "full")
      .select(col("g1"), col("g2"),
        coalesce(col("est_jaccard"), lit(0.0)).as("est_jaccard"),
        coalesce(col("exact_jaccard"), lit(0.0)).as("exact_jaccard"))
  }

  /** SimHash via the native codegen'd expression
    * ([[graft.plans.SimHashExpr]]): the whole signature — tf map, md5
    * token hashes, bit votes — runs inside whole-stage codegen, where
    * [[simhashFast]] breaks the stage at both mapPartitions edges and
    * [[simhash]] pays `bits` interpreted filter passes per row. This is
    * the execution path of [[simhashPairs]]; all three forms are pinned
    * value-equal in DedupSpec.
    */
  def simhashNative(docs: DataFrame, bits: Int = 32,
                    textCol: String = "text", idCol: String = "doc_id",
                    weighted: Boolean = false): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).cast("long").as("doc_id"),
      call_function(graft.plans.GraftFunctions.simhashName,
        TextFunctions.tokens(coalesce(col(textCol), lit(""))),
        lit(bits), lit(weighted)).as("simhash"))
  }

  /** Per-doc SimHash over distinct-token 60-bit hashes, `bits` wide —
    * higher-order-function form (semantics documentation;
    * [[simhashNative]] is the execution path).
    */
  def simhash(docs: DataFrame, bits: Int = 32,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val hs = F.transform(
      array_distinct(TextFunctions.tokens(col(textCol))),
      t => TextFunctions.tokenHash(t))
    val withHs = docs.select(col(idCol).as("doc_id"), hs.as("hs"))
    val sim = (0 until bits).map { j =>
      val votes = size(F.filter(col("hs"),
        x => shiftright(x, j).bitwiseAND(lit(1L)) === 1L))
      when(votes * 2 > size(col("hs")), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    withHs.select(col("doc_id"), sim.as("simhash"))
  }

  /** Near-dup pairs with Hamming(simhash) ≤ `maxHamming` via 8-bit band
    * join (maxHamming < #bands guarantees one equal band — pigeonhole).
    * `weighted` switches the underlying signature from token-SET votes to
    * ±tf votes ([[simhashFast]]'s doc) — tighter on corpora whose docs
    * share a small vocabulary but differ in term frequency.
    */
  def simhashPairs(docs: DataFrame, bits: Int = 32,
                   maxHamming: Int = 3,
                   weighted: Boolean = false): DataFrame = {
    val nChunks = 4
    val width = bits / nChunks
    val mask = (1L << width) - 1
    // both band-join sides read this: hash the corpus once, codegen'd
    val sh = SharedPass.materialize(
      simhashNative(docs, bits, weighted = weighted))
    val chunks = (0 until nChunks).map(c =>
      struct(lit(c).as("c"),
        shiftright(col("simhash"), c * width).bitwiseAND(lit(mask)).as("v")))
    val banded = sh
      .select(col("doc_id"), col("simhash"), explode(array(chunks: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.c").as("c"), col("b.v").as("v"))
    banded.as("x").join(banded.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document EXACT-SUBSTRING duplication spans — the ExactSubstr
    * method of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"): a token span is duplicated when some
    * `windowTokens`-token window of it occurs MORE THAN ONCE in the whole
    * corpus, counting (doc, position) occurrences — so within-doc repeats
    * qualify, exactly the paper's any-second-occurrence rule. The paper
    * removes every such span; this operator REPORTS them as maximal
    * per-doc intervals so the caller can redact, drop, or audit:
    * (doc_id, span_start, span_end, span_tokens), `span_start` 0-based
    * inclusive token position, `span_end` exclusive.
    *
    * Relationship to [[RepeatedSpans.spanStats]] (the same paper's
    * signal, shipped earlier): spanStats answers "HOW MUCH of each doc is
    * repeated" — per-doc counts/coverage with a multiplicity knob, no
    * positions; this family answers "WHERE" — the explicit intervals a
    * redaction pass needs — and [[contaminationSpans]] points the chain
    * across two corpora, which spanStats cannot express.
    *
    * Spark-first shape (the paper builds a monolithic suffix array —
    * single-machine, RAM-bound): windows carry a 128-bit key (a pair of
    * independently-seeded `xxhash64`s of their token text — an order of
    * magnitude cheaper per window than a cryptographic md5, and window
    * hashing IS the dominant CPU of this family), so the duplicate test
    * is ONE count aggregate over window keys (map-side partial combine;
    * never a pair join — a boilerplate window in a million docs costs
    * one count cell, not 10¹² pairs) plus one semi-join back. Span
    * assembly is the gaps-and-islands window per doc: islands break
    * where consecutive duplicated positions are more than a window
    * apart — bounded by DOC length, never corpus-sized.
    * Hash contract: distinct windows colliding in the 128-bit key
    * (birthday bound ≈2⁻¹²⁸·n²— negligible at any corpus size) would
    * over-report a span — the safe direction for dedup. The ORACLE does
    * not replay these bytes: it flags duplicates with its own md5 chain,
    * and the gate compares the resulting FLAG SETS, which agree exactly
    * whenever neither side collides — the key never reaches the output.
    *
    * Shuffle profile at 100 TB: windows are w× the token stream, but
    * only their 16-byte (2×long) keys shuffle (the count agg combines
    * map-side); the semi-join is hash-partitioned on the same key; the
    * island window partitions by doc. The w×-corpus occurrence frame is
    * materialized only under the [[SubstrMaterializeConf]] opt-in
    * (small corpora: one shared tokenize/explode pass, ~1.7× wall win
    * at sf0.1); the DEFAULT recomputes the purely map-side explode for
    * each consumer — two corpus scans and zero block storage, which at
    * 100 TB beats checkpointing ~w× the token stream (≈1 PB of executor
    * storage) by a mile. Choose `windowTokens` ≥ the paper's 50 in
    * production; tests use smaller windows on the synthetic corpus.
    */
  /** (doc_id, pos, win): every `w`-token window's position and its
    * 128-bit key — a struct of two independently-seeded `xxhash64`s
    * computed DIRECTLY over the window's token-array slice (Spark's hash
    * expressions walk arrays in place), 16 bytes on the wire. No window
    * string is ever built: the old `md5(array_join(...))` spelling paid
    * an O(w)-byte allocation+copy per window before the hash even ran —
    * that copy, not the hash, was the family's dominant CPU. Slices are
    * pointer arrays (no character copying), so each window costs w
    * pointer writes plus two in-place hash walks. Purely map-side
    * (tokenize + explode + hash), so recomputing costs one corpus scan
    * and no storage; callers deliberately do NOT checkpoint it.
    */
  private def windowOccurrences(docs: DataFrame, textCol: String,
                                idCol: String, w: Int): DataFrame = {
    require(w >= 2, "windowTokens must be >= 2")
    graft.plans.GraftFunctions.register(docs.sparkSession)
    // window hashing is the family's dominant CPU and is purely map-side:
    // fan the projected (id, text) out of an under-parallel scan before it
    // (no-op at scale — guide §2.5; ScanParallel doc has the contract),
    // then tokenize + key every window in ONE native expression
    // ([[graft.plans.SubstrWindowsExpr]]: per-token hashing + O(1) rolling
    // windows — the old transform/slice/xxhash64(array) chain was
    // CodegenFallback-interpreted AND re-hashed w tokens per window).
    // A null/short doc yields a null array; explode drops it, exactly the
    // old empty-array guard.
    val spread = ScanParallel.fanOut(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("_es_t")),
      Seq(col("doc_id")))
    spread.select(col("doc_id"),
        explode(call_function(graft.plans.GraftFunctions.substrWindowsName,
          col("_es_t"), lit(w))).as("_es_w"))
      .select(col("doc_id"), col("_es_w.pos").as("pos"),
        struct(col("_es_w.h1").as("h1"), col("_es_w.h2").as("h2")).as("win"))
  }

  /** Flagged window positions → maximal per-doc spans: the
    * gaps-and-islands window per doc (bounded by DOC length, never
    * corpus-sized) — islands break where consecutive flagged positions
    * are more than a window apart.
    */
  private def positionsToSpans(dupPos: DataFrame, w: Int): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val run = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    dupPos
      .withColumn("_es_brk",
        when(lag(col("pos"), 1).over(byDoc).isNull ||
          col("pos") - lag(col("pos"), 1).over(byDoc) > w, 1).otherwise(0))
      .withColumn("_es_isl", sum(col("_es_brk")).over(run))
      .groupBy(col("doc_id"), col("_es_isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + w).cast("long").as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
  }

  /** Session conf: "true" materializes the span family's w×-corpus
    * occurrence frame once ([[SharedPass.materialize]]) so its two
    * consumers (duplicate count + semi-join probe) share one
    * tokenize/explode pass — the right call on SMALL corpora (the frame
    * fits block storage; measured ~1.7× wall win at sf0.1). DEFAULT OFF:
    * at 100 TB the frame is ~w× the token stream (≈1 PB of executor
    * block storage) persisted to save one scan of a map-side stage — a
    * bad trade, so the scale-safe default recomputes the explode for
    * each consumer (two corpus scans, zero storage).
    */
  val SubstrMaterializeConf = "graft.substr.materialize"

  private def maybeShared(occ: DataFrame): DataFrame =
    if (occ.sparkSession.conf.getOption(SubstrMaterializeConf)
        .exists(_.trim.equalsIgnoreCase("true")))
      SharedPass.materialize(occ)
    else occ

  def exactSubstrSpans(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       windowTokens: Int = 50): DataFrame = {
    val w = windowTokens
    // occurrence-frame policy: see [[SubstrMaterializeConf]] — default
    // recomputes the map-side explode per consumer (100-TB-safe, zero
    // block storage); small corpora opt into one shared pass
    val occ = maybeShared(windowOccurrences(docs, textCol, idCol, w))
    val dup = occ.groupBy("win").agg(count(lit(1)).as("_es_c"))
      .filter(col("_es_c") > 1).select("win")
    positionsToSpans(
      occ.join(dup, Seq("win"), "left_semi").select(col("doc_id"), col("pos")),
      w)
  }

  /** SPAN-GRAIN benchmark contamination — [[exactSubstrSpans]]'s chain
    * pointed across two corpora: every maximal span of a TRAINING doc
    * whose `windowTokens`-token windows appear verbatim anywhere in
    * `refs` (the eval/benchmark set). Doc-grain decontamination
    * ([[Decontamination.contaminatedPairs]]) says WHICH docs overlap
    * WHICH eval docs; this says WHERE — the redaction-grade answer
    * (surgically cut the leaked passage, keep the document). Same scale
    * shape: the ref side collapses to DISTINCT window hashes (benchmark
    * corpora are tiny next to training corpora), one semi-join flags
    * positions, islands assemble per doc.
    */
  def contaminationSpans(docs: DataFrame, refs: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         windowTokens: Int = 50): DataFrame = {
    val w = windowTokens
    val d = windowOccurrences(docs, textCol, idCol, w)
    val r = windowOccurrences(refs, textCol, idCol, w)
      .select("win").distinct()
    positionsToSpans(
      d.join(r, Seq("win"), "left_semi").select(col("doc_id"), col("pos")),
      w)
  }

  /** Per-document rollup of [[exactSubstrSpans]]: every doc (spanless
    * ones included) with its token count, duplicated-span count,
    * duplicated token total, and the duplication ratio — the corpus-audit
    * number ExactSubstr reports ("how much of my corpus is verbatim
    * duplicated text"). At multiplicity 2 this is the interval-union view
    * of [[RepeatedSpans.spanStats]]'s coverage numbers; keep spanStats
    * when you want the minCount knob or flagged-window counts, this when
    * the downstream consumer is the span table above.
    */
  def exactSubstrStats(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       windowTokens: Int = 50): DataFrame = {
    val spans = exactSubstrSpans(docs, textCol, idCol, windowTokens)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum("span_tokens").as("dup_tokens"))
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokenCount(TextFunctions.tokens(col(textCol)))
          .cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)) /
          greatest(col("n_tokens"), lit(1L)), 6).as("dup_ratio"))
  }

  /** The END of the Lee et al. pipeline: CUT the duplicated spans.
    * Composes [[exactSubstrSpans]] with a span-subtraction rewrite —
    * every token whose 0-based position falls inside a flagged
    * `[span_start, span_end)` interval is dropped, the survivors
    * re-joined with single spaces — so the family's consumer story is
    * end-to-end: detect → report → REDACT. Returns every doc (spanless
    * ones pass through re-joined on the same tokenization) as
    * (doc_id, text_redacted, n_tokens, kept_tokens, removed_tokens);
    * `removed_tokens` equals [[exactSubstrStats]]'s `dup_tokens` by
    * construction (the spans are the interval union of flagged windows).
    *
    * Scale shape: the spans frame is tiny next to the corpus (one row
    * per maximal duplicated interval), aggregated per doc and joined
    * back on `doc_id` — a plain shuffled equi-join on the doc key; the
    * subtraction itself is a per-row array fold (`transform` + `filter`
    * over the token array against the doc's own span list), no second
    * corpus-grain shuffle and nothing driver-side.
    */
  def exactSubstrRedact(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id",
                        windowTokens: Int = 50): DataFrame =
    redactSpans(docs, exactSubstrSpans(docs, textCol, idCol, windowTokens),
      textCol, idCol)

  /** The span-subtraction rewrite alone: cut the given
    * `(doc_id, span_start, span_end, …)` intervals out of `docs` — the
    * frame any span producer emits ([[exactSubstrSpans]] for
    * whole-corpus dedup, [[exactSubstrSpansIncremental]] for the daily
    * screen, [[contaminationSpansFromIndex]] for benchmark leaks), so
    * redaction composes with every detector instead of re-running one.
    * Same output contract and scale shape as [[exactSubstrRedact]] (which
    * is this applied to its own spans): the spans frame is span-grain
    * (tiny next to the corpus), one doc-key join, a per-row array fold,
    * no second corpus-grain shuffle. The caller must have produced
    * `spans` on the SAME tokenization of the same text column.
    */
  def redactSpans(docs: DataFrame, spans: DataFrame,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val perDoc = spans
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_es_spans"))
    val toks = TextFunctions.tokens(col(textCol))
    val spanList = coalesce(col("_es_spans"),
      array().cast("array<struct<span_start:bigint,span_end:bigint>>"))
    // position-aware keep filter: two-arg transform carries the index,
    // exists tests it against the doc's own (tiny) span list
    val kept = filter(
      transform(col("_es_toks"), (t, i) =>
        when(exists(spanList, s =>
          i.cast("long") >= s("span_start") &&
            i.cast("long") < s("span_end")), lit(null)).otherwise(t)),
      t => t.isNotNull)
    docs.select(col(idCol).as("doc_id"), toks.as("_es_toks"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(kept, " ").as("text_redacted"),
        size(col("_es_toks")).cast("long").as("n_tokens"),
        size(kept).cast("long").as("kept_tokens"),
        (size(col("_es_toks")) - size(kept)).cast("long")
          .as("removed_tokens"))
  }

  /** Schema-metadata key carrying the window size an index was built at —
    * stamped on the `h1` field by [[exactSubstrIndex]] and validated by
    * every screen. Keys built at different windows NEVER match, so a
    * mismatched screen wouldn't fail — it would silently miss every base
    * overlap; the guard turns that into an immediate error. Metadata
    * rides the schema (parquet footer + the tx-log's manifest schema), so
    * the check is free: no scan, no sidecar, survives append/compact
    * round-trips. Absent metadata (a pre-guard index) is accepted.
    */
  val IndexWindowMetaKey = "graft.substr.windowTokens"

  /** Schema-metadata key carrying the window-KEY FAMILY an index was built
    * with, and the family this build produces. The key family changed once
    * (round 15: interpreted `xxhash64(array-of-tokens)` pair → rolling
    * polynomial over per-token XXH64 lanes, [[graft.plans.SubstrWindowsExpr]]);
    * keys from different families never collide meaningfully, so screening
    * a batch against an index persisted under another family would not
    * fail — it would silently flag (almost) nothing. The stamp turns that
    * into a hard error. Absent metadata is accepted: indexes written
    * between the family change and this stamp carry no marker and ARE
    * current-family, and every in-repo consumer rebuilds per run anyway —
    * the stamp protects the persisted cross-build CLI flow going forward.
    */
  val IndexKeyFamilyMetaKey = "graft.substr.keyFamily"

  /** Current window-key family id ([[graft.plans.SubstrWindowsExpr]]'s
    * rolling polynomial over per-token XXH64, two lanes).
    */
  val SubstrKeyFamily = "xxh64-rollpoly-v2"

  private def requireIndexWindow(index: DataFrame, w: Int): Unit =
    index.schema.find(_.name == "h1").foreach { f =>
      if (f.metadata.contains(IndexWindowMetaKey)) {
        val iw = f.metadata.getLong(IndexWindowMetaKey)
        require(iw == w,
          s"index was built at windowTokens=$iw but the screen asks for " +
            s"$w — window keys never match across sizes, so this screen " +
            "would silently miss every base overlap; rebuild the index " +
            "or screen at the index's window")
      }
      if (f.metadata.contains(IndexKeyFamilyMetaKey)) {
        val fam = f.metadata.getString(IndexKeyFamilyMetaKey)
        require(fam == SubstrKeyFamily,
          s"index was built under window-key family '$fam' but this build " +
            s"produces '$SubstrKeyFamily' — keys from different families " +
            "never match, so this screen would silently under-flag; " +
            "rebuild the index with the current build")
      }
    }

  /** Key-merging COMPACTION of a persisted [[exactSubstrIndex]] table:
    * re-aggregate every appended `(h1, h2, cnt)` frame into ONE
    * `sum(cnt)`-merged frame and commit it as a new version in the
    * write-once/join-many BUCKETED layout
    * ([[graft.sources.VersionedTable.overwriteBucketed]] on the exact
    * screen-join keys `(h1, h2)`). Two costs die at once:
    *
    *  - the screen's per-run re-aggregation stops growing with append
    *    count — after a year of daily `--append`s the un-compacted index
    *    is 365 frames whose duplicate keys never merge (`compactSmall`
    *    concatenates files but cannot collapse keys); compaction keeps
    *    the screen O(distinct windows);
    *  - the index-side SHUFFLE disappears forever: the daily screen
    *    equi-joins the batch's counts against the index on `(h1, h2)`,
    *    and at 100 TB the index is ~distinct-windows ≈ token-scale — an
    *    un-bucketed layout re-shuffles that corpus-sized frame on EVERY
    *    screen, while the bucketed scan
    *    ([[graft.sources.VersionedTable.readVersionBucketed]]) reports
    *    its hash partitioning and the screen plans with no exchange
    *    above the index scan (only the day's batch shuffles).
    *
    * Count additivity makes compaction INVISIBLE to screens (they
    * aggregate `sum(cnt)` per key either way) — semantics and oracle
    * unchanged, layout only. Returns the committed version; stamp it in
    * the corpus/index transaction log like any other index commit.
    */
  def compactSubstrIndex(vt: graft.sources.VersionedTable,
                         nBuckets: Int = 32,
                         at: Option[Long] = None): Long = {
    // CAS on the version that was read: a screen --append landing between
    // this read and the commit would otherwise be silently erased by the
    // rewrite (the staged merge is a function OF that snapshot) —
    // expectedHead turns the race into a loud ConcurrentWriteException to
    // re-run. Callers that already VALIDATED a pin (the CLI's
    // stamped-pin check) pass it as `at` so the fold anchors on the
    // checked version, not a head re-read a concurrent staged-but-
    // unstamped append could have moved.
    val head = at.orElse(vt.latestVersion).getOrElse(
      throw new IllegalStateException(s"no committed index at ${vt.root}"))
    val merged = vt.readVersion(head).groupBy(col("h1"), col("h2"))
      .agg(sum(col("cnt")).as("cnt"))
    vt.overwriteBucketed(merged, nBuckets,
      bucketCols = Seq("h1", "h2"), sortCols = Seq("h1", "h2"),
      expectedHead = Some(head))
  }

  /** Persisted ExactSubstr INDEX frame: each distinct window key of
    * `docs` with its occurrence count — `(h1, h2, cnt)`, the flattened
    * spelling of [[windowOccurrences]]'s 128-bit key so it parquets as
    * two longs. The incremental daily-crawl shape: build this once from
    * the base corpus (a [[graft.sources.VersionedTable]] overwrite),
    * screen each day's batch against it ([[exactSubstrSpansIncremental]])
    * WITHOUT re-tokenizing a byte of base text, then APPEND the batch's
    * own count frame — the index is additive by construction (screens
    * aggregate `sum(cnt)` per key), so maintenance is the cheapest
    * commit the log has and never a rebuild.
    */
  def exactSubstrIndex(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id",
                       windowTokens: Int = 50): DataFrame = {
    val meta = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(IndexWindowMetaKey, windowTokens.toLong)
      .putString(IndexKeyFamilyMetaKey, SubstrKeyFamily).build()
    windowOccurrences(docs, textCol, idCol, windowTokens)
      .groupBy(col("win")).agg(count(lit(1)).as("cnt"))
      .select(col("win.h1").as("h1", meta), col("win.h2").as("h2"),
        col("cnt"))
  }

  /** ExactSubstr spans of a NEW batch against base-plus-batch — the
    * differential twin of [[exactSubstrSpans]]: a new doc's window is
    * duplicated when its total multiplicity across the BASE corpus (read
    * from the persisted `(h1, h2, cnt)` index — summed per key, so an
    * append-only index is exact) plus the new batch itself exceeds one.
    * EQUALS `exactSubstrSpans(base ∪ new)` restricted to the new docs,
    * by count additivity — the differential gate index maintenance
    * needs. Scale shape: one scan of the new batch's occurrences (its
    * count agg + the probe), one scan of the index, a shuffled equi-join
    * on the 16-byte key; base TEXT is never re-read — that scan, w×
    * hashing included, is the whole point of persisting the index.
    */
  def exactSubstrSpansIncremental(newDocs: DataFrame, baseIndex: DataFrame,
                                  textCol: String = "text",
                                  idCol: String = "doc_id",
                                  windowTokens: Int = 50): DataFrame = {
    val w = windowTokens
    requireIndexWindow(baseIndex, w)
    val occ = maybeShared(windowOccurrences(newDocs, textCol, idCol, w))
    val newCnt = occ.groupBy(col("win")).agg(count(lit(1)).as("_es_nc"))
    val base = baseIndex.groupBy(col("h1"), col("h2"))
      .agg(sum(col("cnt")).as("_es_bc"))
    val dup = newCnt.join(base,
        col("win.h1") === col("h1") && col("win.h2") === col("h2"), "left")
      .filter(col("_es_nc") + coalesce(col("_es_bc"), lit(0L)) > 1)
      .select(col("win"))
    positionsToSpans(
      occ.join(dup, Seq("win"), "left_semi").select(col("doc_id"), col("pos")),
      w)
  }

  /** [[contaminationSpans]] against a PERSISTED benchmark index — the
    * production decontamination shape: benchmark suites are STATIC, so
    * hash the eval set into an [[exactSubstrIndex]] frame ONCE and
    * screen every crawl batch against it forever, never re-reading a
    * byte of benchmark text. The flag rule differs from
    * [[exactSubstrSpansIncremental]]: ANY presence in the ref index
    * contaminates (cnt ≥ 1 — the batch's own multiplicity is
    * irrelevant), so the join is a plain semi-join on the 16-byte key.
    * EQUALS `contaminationSpans(docs, refs)` when the index was built
    * from `refs` at the same window — the differential gate.
    */
  def contaminationSpansFromIndex(docs: DataFrame, refIndex: DataFrame,
                                  textCol: String = "text",
                                  idCol: String = "doc_id",
                                  windowTokens: Int = 50): DataFrame = {
    val w = windowTokens
    requireIndexWindow(refIndex, w)
    val occ = windowOccurrences(docs, textCol, idCol, w)
    val ref = refIndex.select(col("h1"), col("h2"))
    positionsToSpans(
      occ.join(ref,
        col("win.h1") === col("h1") && col("win.h2") === col("h2"),
        "left_semi").select(col("doc_id"), col("pos")),
      w)
  }
}
