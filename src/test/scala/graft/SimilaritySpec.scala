package graft

import org.apache.spark.sql.execution.FormattedMode

import graft.operators.Similarity

/** ANN contracts: the declared near-dup query runs on the banded LSH scale
  * path (never a cross product); brute force survives only here, as the
  * recall-calibration baseline it is.
  */
class SimilaritySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH near-dup pairs ⊆ brute-force exact pairs, and non-empty") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val lsh = pairs(Similarity.lshPairs(e, dim = 64, nPlanes = 48, bands = 12,
      minCos = 0.45))
    val brute = pairs(Similarity.bruteForcePairs(e, minCos = 0.45))
    assert(lsh.nonEmpty)          // the banding finds real pairs at test scale
    assert(lsh.subsetOf(brute))   // candidates are re-scored exactly: no false positives
    // exact-recall gate: the declared sim_near_dup oracle replays the SAME
    // LSH in DuckDB (cross-engine parity), so the recall-vs-exact claim
    // lives here, against the uncapped brute-force baseline
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.8,
      f"LSH recall $recall%.3f vs exact baseline (|lsh|=${lsh.size}, |brute|=${brute.size}) below 0.8")
  }

  test("headline SemDeDup regime: candidate mass is ~n·bands, not ~n²") {
    import org.apache.spark.sql.functions._
    // the exact augmented source dedup_semantic_twins benches: 50
    // re-encoded duplicates on top of the corpus, WIDE 12-bit bands
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val aug = e.select(col("vec_id"), col("embedding")).unionAll(
      e.filter(col("vec_id") < 50)
        .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
    val n = aug.count()
    val bands = 4L
    val prodCand = Similarity.lshCandidates(aug, dim = 64, nPlanes = 48,
      bands = 4).count()
    // production regime: every twin collides with its source in all 4
    // bands (≥ 50 pairs), and the total stays within a small multiple of
    // n·bands — the property that keeps the plan data-proportional at
    // 100× (all-pairs would be n(n−1)/2 ≈ 150k here)
    assert(prodCand >= 50, s"twin pairs must all collide ($prodCand)")
    assert(prodCand <= n * bands,
      s"candidate mass $prodCand exceeds n·bands = ${n * bands} — the " +
        "wide-band regime must not degrade toward all pairs")
    // contrast: the narrow-band stress query's candidates are a large
    // fraction of all pairs on this near-orthogonal corpus (documented
    // X209 worst case) — the reason it lost the headline slot
    val allPairs = n * (n - 1) / 2
    val stressCand = Similarity.lshCandidates(aug, dim = 64, nPlanes = 48,
      bands = 12).count()
    assert(stressCand > allPairs / 4,
      s"expected the 4-bit-band stress regime to collide heavily " +
        s"($stressCand of $allPairs) — if this starts pruning, the " +
        "headline/stress split no longer documents a real contrast")
  }

  test("hard negatives: never the anchor's label, ranked by cosine") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.hardNegatives(e, nQueries = 5, k = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    // no negative shares its anchor's label (the whole point)
    assert(got.forall { case (q, _, v, _) => labels(v) != labels(q) })
    // per query: ranks are 1..k and cosine non-increasing along them
    got.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to rows.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 >= y._4; case _ => true
      }, s"query $q: cosine must not increase with rank")
    }
  }

  test("k-center: radius sequence monotone, picks distinct and far-first") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val got = Similarity.kCenterSelect(e, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (1L to 6L))
    assert(got.map(_._2).distinct.length == 6, "picks must be distinct")
    // the max-min radius each pick closes can never grow
    assert(got.map(_._3).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    }, s"radii must be non-increasing: ${got.map(_._3).mkString(", ")}")
    assert(got.head._3 > 0.0, "first pick must sit at positive distance")
  }

  test("MMR: query self-picks first, scores non-increasing, picks distinct") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val got = Similarity.mmrSelect(e, k = 6, lambda = 0.7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 6L))
    assert(got.map(_._2).distinct.length == 6, "picks must be distinct")
    // the query vector IS in the pool, so round 1 is its self-retrieval
    val minId = e.agg(org.apache.spark.sql.functions.min("vec_id"))
      .head.getLong(0)
    assert(got.head._2 == minId && got.head._3 == 1.0)
    // pool shrinks and the penalty only grows → argmax can never rise
    assert(got.map(_._4).sliding(2).forall {
      case Array(a, b) => a >= b; case _ => true
    }, s"scores must be non-increasing: ${got.map(_._4).mkString(", ")}")
    // diversity beats pure relevance from round 2 on: each pick's score
    // is its λ·rel minus a nonnegative penalty
    got.tail.foreach { case (_, _, rel, sc) =>
      assert(sc <= 0.7 * rel + 1e-9)
    }
  }

  test("no declared similarity query plans a nested-loop cross product") {
    for (name <- Seq("sim_near_dup", "sim_ann_lsh", "sim_blocked_ivf", "sim_topk")) {
      val p = SparkEntry.all(name).build(spark, sf("sf0.01"))
        .queryExecution.explainString(FormattedMode)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      // topK's broadcast of the tiny query set is the one legitimate BNLJ
      // (|Q| rows broadcast, corpus streamed once); pair queries must not
      if (name != "sim_topk")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ")
    }
  }

  test("IVF search recall vs exact top-k; probing fewer cells than exist") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
    val nCells = e.select("label").distinct().count()
    assert(nCells > 2) // nProbe=2 genuinely restricts the search
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.topK(e, nQueries = 10, k = 5))
    val ivf = hits(Similarity.ivfSearch(e, nQueries = 10, k = 5, nProbe = 2))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    // the test corpus clusters weakly (labels carry mild signal), so the
    // honest gates are: 2-probe recall must beat the structure-free
    // baseline of nProbe/nCells cells searched…
    val baseline = 2.0 / nCells
    assert(recall > baseline + 0.05,
      f"IVF recall $recall%.3f does not beat the $baseline%.2f random-cell baseline")
    // …and probing EVERY cell must reproduce exact brute-force top-k
    // bit-for-bit (same 6-dp scores, same tiebreaks) — the IVF dial's
    // degenerate end is provably lossless
    val full = hits(Similarity.ivfSearch(e, nQueries = 10, k = 5,
      nProbe = nCells.toInt))
    assert(full == exact, "full-probe IVF must equal exact top-k")
  }

  test("k-means IVF: deterministic training, full-probe ≡ exact, recall grows with probes") {
    // 600-vector slice, 3 Lloyd iterations: the contracts under test
    // (run-to-run determinism, full-probe ≡ exact, probe monotonicity) are
    // scale-free, and this test re-trains FIVE times — the full sf0.01
    // corpus at maxIter=5/10 was ~4 min of suite wall for no extra coverage
    val e = Tables.embeddings(spark, sf("sf0.01"))
      .filter(org.apache.spark.sql.functions.col("vec_id") < 600)
    def centMap(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Double]] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // training twice yields IDENTICAL doubles: init is data-ordered (no
    // RNG) and lane sums are exact decimals, so partition order can't leak
    val c1 = centMap(Similarity.kmeansCentroids(e, k = 8, maxIter = 3))
    val c2 = centMap(Similarity.kmeansCentroids(e, k = 8, maxIter = 3))
    assert(c1 == c2, "k-means training must be run-to-run deterministic")
    assert(c1.size == 8)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Similarity.topK(e, nQueries = 10, k = 5))
    // probing every trained cell reproduces exact brute-force top-k —
    // same 6-dp scores, same tiebreaks, regardless of what Lloyd learned
    val full = hits(Similarity.ivfSearchKMeans(e, nCells = 8, nQueries = 10,
      k = 5, nProbe = 8, maxIter = 3))
    assert(full == exact, "full-probe k-means IVF must equal exact top-k")
    // recall is monotone in nProbe (candidates only grow) and the trained
    // quantizer must beat the structure-free random-cell baseline
    def recall(nProbe: Int): Double = {
      val ivf = hits(Similarity.ivfSearchKMeans(e, nCells = 8, nQueries = 10,
        k = 5, nProbe = nProbe, maxIter = 3))
      (exact intersect ivf).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r3 >= r1, f"recall must not drop with more probes ($r1%.3f -> $r3%.3f)")
    assert(r3 > 3.0 / 8 + 0.05,
      f"3-probe recall $r3%.3f does not beat the random-cell baseline")
  }

  test("k-means++ seeding: deterministic, k distinct seeds, spread-out init") {
    // same 600-vector slice + 3 iterations as the Lloyd test: the seeding
    // contracts are scale-free and this trains twice more
    val e = Tables.embeddings(spark, sf("sf0.01"))
      .filter(org.apache.spark.sql.functions.col("vec_id") < 600)
    def centMap(df: org.apache.spark.sql.DataFrame): Map[Int, Seq[Double]] =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // the exponential-race draw is hash-seeded, not RNG-seeded: two runs
    // over the same data must pick the exact same seeds and converge to
    // the exact same doubles
    val c1 = centMap(Similarity.kmeansCentroids(e, k = 8, maxIter = 3, init = "pp"))
    val c2 = centMap(Similarity.kmeansCentroids(e, k = 8, maxIter = 3, init = "pp"))
    assert(c1 == c2, "pp-seeded training must be run-to-run deterministic")
    assert(c1.size == 8, "pp seeding must produce k cells on a diverse corpus")
    assert(c1.values.toSet.size == 8, "pp seeds must be distinct")
    // D²-weighted seeding must actually spread: the minimum pairwise
    // angular distance between CONVERGED centroids should not collapse to
    // ~0 (which is what duplicate seeds in one dense region produce)
    def minPairDist(cm: Map[Int, Seq[Double]]): Double = {
      val vs = cm.values.toSeq
      (for { i <- vs.indices; j <- vs.indices if i < j } yield {
        val (a, b) = (vs(i), vs(j))
        val dot = a.zip(b).map(t => t._1 * t._2).sum
        val na = math.sqrt(a.map(x => x * x).sum)
        val nb = math.sqrt(b.map(x => x * x).sum)
        1.0 - dot / (na * nb)
      }).min
    }
    assert(minPairDist(c1) > 1e-6,
      "pp-seeded centroids must not collapse onto each other")
  }

  test("JL 64->32 sign projection: cosine distortion bounded (the JL guarantee)") {
    // NB: top-k RECALL is the wrong gate here — this corpus's neighbor
    // margins are thinner than any k=O(10s) projection's distortion, so
    // ranking is not preserved (measured ~0.1 recall@5). What JL actually
    // guarantees is bounded pairwise distortion; the corpus and the
    // md5-sign matrix are deterministic, so these bounds are exact
    // regression pins (measured: mean 0.142, max 0.513 at k=32).
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val planes = graft.functions.VectorFunctions.hyperplanes(32, 64)
    val projCols = planes.map { coefs =>
      aggregate(zip_with(col("embedding"), typedLit(coefs),
        (x, w) => x.cast("double") * w), lit(0.0), (a, x) => a + x) /
        lit(math.sqrt(32.0))
    }
    val projected = emb.select(col("vec_id"),
      array(projCols: _*).as("v32"))
    def cosOf(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map(t => t._1 * t._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val full = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .sortBy(_._1).map(_._2)
    val proj = projected.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1).map(_._2)
    val devs = full.indices.dropRight(1).map { i =>
      math.abs(cosOf(full(i), full(i + 1)) - cosOf(proj(i), proj(i + 1)))
    }
    val mean = devs.sum / devs.size
    assert(mean <= 0.20, s"mean |dcos| $mean exceeds JL bound")
    assert(devs.max <= 0.60, s"max |dcos| ${devs.max} exceeds JL bound")
  }
}
