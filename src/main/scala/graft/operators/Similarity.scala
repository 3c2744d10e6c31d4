package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

import graft.functions.VectorFunctions
import graft.plans.GraftFunctions

/** Similarity search over an `array<float>` embedding column.
  *
  * [[topK]] is the brute-force baseline: broadcast the (small) query set
  * against the full corpus — one scan, no shuffle until the final per-query
  * top-k (tiny). This is the right plan whenever |queries| is broadcastable;
  * at 100 TB the corpus side stays partition-parallel and the ranking
  * aggregates map-side.
  *
  * [[lshPairs]] is the scale path for all-pairs search: random-hyperplane
  * signatures (expression-only), candidates from a band equi-join, exact
  * re-scoring of candidates only. Recall/cost is tuned by (nPlanes, bands)
  * exactly like MinHash banding.
  *
  * The inner product runs through the codegen'd [[graft.plans.DotProduct]]
  * expression (reads float lanes directly, left-to-right double
  * accumulation — same value as the higher-order fold in
  * [[VectorFunctions.dot]] and as DuckDB's `list_dot_product`).
  */
object Similarity {

  private def dotFast(a: Column, b: Column): Column =
    call_function(GraftFunctions.dotName, a, b)

  /** Cosine from precomputed norms: |a| and |b| are computed once per row
    * before the pair join instead of once per pair — identical doubles
    * (same sqrt, same multiply), 3× fewer dot products in the pair stage.
    */
  private def cosinePre(dot: Column, na: Column, nb: Column): Column =
    dot / nullif(na * nb, lit(0.0))

  /** 6-dp-rounded cosine over the higher-order-function dot — the ONE
    * value every IVF stage (train-assign, probe, and the SQL oracle
    * replay) must agree on; keep it single-sourced.
    */
  private def cosD(a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions.{dot => hdot}
    round(hdot(a, b) / nullif(sqrt(hdot(a, a)) * sqrt(hdot(b, b)),
      lit(0.0)), 6)
  }

  private def prep(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    embeddings.select(col("vec_id"), col("embedding").as("v"),
      sqrt(dotFast(col("embedding"), col("embedding"))).as("nrm"))
  }

  /** EXACT per-query top-k over a scored candidate frame
    * (query_id, vec_id, cos) WITHOUT a candidate-mass window partition:
    * a window partitioned by query alone sorts |candidates-per-query|
    * rows in one task — corpus-sized for the brute-force scorers. Phase
    * 1 ranks within (query, salt) sub-groups (salt = hash(vec_id) mod
    * `salts`, deterministic) and keeps each sub-group's top-k: for ANY
    * partition of the candidates into sub-groups, the global top-k is a
    * subset of the union of per-sub-group top-k's, so the prune is
    * lossless. Phase 2 ranks the ≤ salts·k survivors per query exactly.
    * Ordering is (cos desc, vec_id) at both phases — the reproducible
    * tie rule every oracle replays.
    */
  private def topKExact(scored: DataFrame, k: Int,
                        salts: Int = 64): DataFrame = {
    val wLoc = Window
      .partitionBy(col("query_id"), pmod(hash(col("vec_id")), lit(salts)))
      .orderBy(desc("cos"), col("vec_id"))
    val pruned = scored.withColumn("_lr", row_number().over(wLoc))
      .filter(col("_lr") <= k).drop("_lr")
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), col("vec_id"))
    pruned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "vec_id", "cos")
  }

  /** Top-k cosine neighbors for each query vector (query set = vec_id <
    * nQueries), self-matches excluded. Ranked on the 6-decimal-rounded
    * cosine with vec_id tiebreak so ordering is reproducible across engines.
    */
  def topK(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = prep(embeddings)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosinePre(dotFast(col("qv"), col("v")),
          col("qnrm"), col("nrm")), 6).as("cos"))
    topKExact(scored, k)
  }

  /** Hard-negative mining for contrastive training: per query vector,
    * the top-k most-similar vectors carrying a DIFFERENT label — the
    * "closest impostors" a metric-learning batch builder pairs against
    * each anchor (informative negatives by construction, where random
    * negatives are mostly trivial). `label` stands in for whatever
    * positive-equivalence key the pipeline carries (dedup cluster,
    * source, query id). Same shape as [[topK]]: broadcast query set,
    * codegen'd dot, per-query rounded-cosine ranking — work scales with
    * |corpus|·|queries|, and the label guard sits in the join condition
    * so same-label rows never reach the sort.
    */
  def hardNegatives(embeddings: DataFrame, nQueries: Int = 10,
                    k: Int = 5): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("label"),
      col("embedding").as("v"),
      sqrt(dotFast(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = e.join(broadcast(q), col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        round(cosinePre(dotFast(col("qv"), col("v")),
          col("qnrm"), col("nrm")), 6).as("cos"))
    topKExact(scored, k)
  }

  /** Fused one-pass cosine ([[graft.plans.CosineSim]]) — for UNIQUE pairs,
    * where per-row norm precompute can't amortize (see that class's doc
    * for the trade vs [[prep]]'s norm column).
    */
  private def cosFused(a: Column, b: Column): Column =
    call_function(GraftFunctions.cosName, a, b)

  /** k-center greedy coreset selection (Sener & Savarese '18): starting
    * from the min-id seed, repeatedly pick the vector FARTHEST (cosine
    * distance, 6-dp rounded, id ties) from everything selected so far —
    * the classic coverage-maximizing diversity selector, the third leg
    * next to dedup (redundancy removal) and DSIR (distribution
    * matching). Returns the k picks in selection order with the max-min
    * distance each closed: a monotone non-increasing radius sequence
    * that IS the coreset's coverage guarantee.
    *
    * Scale shape: k driver rounds, each ONE map over the corpus (the
    * new center rides along as a literal array — no join, no shuffle)
    * plus one distributed argmax (TakeOrderedAndProject); running
    * min-distance state is a checkpointed column, so total work is
    * O(k·n·d) with k actions — the textbook distributed k-center.
    */
  def kCenterSelect(embeddings: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val el = embeddings.select(col("vec_id"), col("embedding"))
    var center: Seq[Float] =
      el.orderBy("vec_id").limit(1).collect()(0).getSeq[Float](1)
    var cur = el.withColumn("d", lit(Double.MaxValue))
    val picks = scala.collection.mutable.ListBuffer.empty[(Long, Long, Double)]
    for (i <- 1 to k) {
      cur = cur.withColumn("d",
          least(col("d"), round(lit(1.0) -
            cosFused(col("embedding"), typedLit(center)), 6)))
        .localCheckpoint(true)
      val best = cur.orderBy(desc("d"), col("vec_id")).limit(1).collect()(0)
      picks += ((i.toLong, best.getLong(0), best.getDouble(2)))
      center = best.getSeq[Float](1)
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    picks.toSeq.toDF("rank", "vec_id", "d")
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein '98):
    * the relevance-WEIGHTED diversity selector next to [[kCenterSelect]]
    * (pure coverage) — k rounds of argmax over
    * `λ·rel − (1−λ)·max_{s∈S} sim(d, s)`, where `rel` is the 6-dp cosine
    * to the query vector (min-id embedding, the deterministic stand-in
    * for a retrieval query) and the penalty floor is 0 (anticorrelated
    * items score their plain λ·rel, not a bonus). Picked rows leave the
    * pool; ties break on vec_id. Returns picks in selection order with
    * (rel, score) — the re-ranked retrieval page a RAG pipeline serves.
    *
    * Scale shape: identical to k-center — k driver rounds, each ONE map
    * (the picked vector rides as a literal, max-sim is a checkpointed
    * running column, max of 6-dp-rounded cosines so update order can
    * never wobble it) plus one distributed argmax. O(k·n·d) total.
    */
  def mmrSelect(embeddings: DataFrame, k: Int,
                lambda: Double = 0.7): DataFrame = {
    require(k >= 1, "k must be >= 1")
    GraftFunctions.register(embeddings.sparkSession)
    val el = embeddings.select(col("vec_id"), col("embedding"))
    val first = el.orderBy("vec_id").limit(1).collect()
    require(first.nonEmpty, "mmrSelect needs a non-empty embeddings frame")
    val qv: Seq[Float] = first(0).getSeq[Float](1)
    var cur = el
      .withColumn("rel", round(cosFused(col("embedding"), typedLit(qv)), 6))
      .withColumn("ms", lit(0.0))
    val picks =
      scala.collection.mutable.ListBuffer.empty[(Long, Long, Double, Double)]
    var i = 1
    var drained = false
    while (i <= k && !drained) {
      val scored = cur.withColumn("score",
        round(lit(lambda) * col("rel") - lit(1.0 - lambda) * col("ms"), 6))
      scored.orderBy(desc("score"), col("vec_id")).limit(1)
        .collect().headOption match {
        case Some(best) =>
          val (id, v) = (best.getLong(0), best.getSeq[Float](1))
          picks += ((i.toLong, id, best.getDouble(2), best.getDouble(4)))
          cur = cur.filter(col("vec_id") =!= id)
            .withColumn("ms", greatest(col("ms"),
              round(cosFused(col("embedding"), typedLit(v)), 6)))
            .localCheckpoint(true)
          i += 1
        case None => drained = true // k > pool: return every pick made
      }
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    picks.toSeq.toDF("rank", "vec_id", "rel", "score")
  }

  /** All pairs (a < b) with cosine ≥ `minCos` — brute force, for oracle
    * parity and as the exact baseline the LSH variant is measured against.
    */
  def bruteForcePairs(embeddings: DataFrame, minCos: Double): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val a = embeddings.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = embeddings.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(cosFused(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** IVF-style blocked pairs: an upstream assignment column (here `label`,
    * standing in for a coarse-quantizer cell id) restricts the candidate
    * space to within-cell pairs — the classic inverted-file layout. The
    * block column becomes the shuffle key, so each cell's pairs compute
    * co-partitioned.
    */
  def blockedPairs(embeddings: DataFrame, blockCol: String,
                   minCos: Double): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    def side(idAs: String, vAs: String) =
      embeddings.select(col(blockCol).as("blk"), col("vec_id").as(idAs),
        col("embedding").as(vAs))
    side("a", "va").join(side("b", "vb"), Seq("blk"))
      .filter(col("a") < col("b"))
      .select(col("blk"), col("a"), col("b"),
        round(cosFused(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Int8 scalar quantization: per-vector symmetric scale (max|x| / 127),
    * embedding lanes rounded to [-127, 127]. 4× smaller at rest and in
    * shuffle than float32 — the standard storage/bandwidth lever for
    * billion-vector corpora; similarity is then computed on the quantized
    * lanes (dequantized on the fly via the scale product).
    */
  def quantizeInt8(embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val absMax = aggregate(col("embedding"), lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    embeddings
      .withColumn("scale", absMax / 127.0)
      .withColumn("qvec", when(col("scale") > 0,
        F.transform(col("embedding"),
          x => round(x.cast("double") / col("scale"), 0).cast("double"))))
  }

  /** Top-k neighbors scored on int8-quantized vectors: cosine over the
    * quantized lanes (scales cancel in the cosine, so they only matter for
    * the dot magnitudes). Recall vs exact [[topK]] is pinned in
    * QuantizeSpec.
    */
  def topKQuantized(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = quantizeInt8(embeddings)
      .select(col("vec_id"), col("qvec").as("v"),
        sqrt(call_function(GraftFunctions.dotName, col("qvec"), col("qvec"))).as("nrm"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    topKExact(
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          round(cosinePre(dotFast(col("qv"), col("v")),
            col("qnrm"), col("nrm")), 6).as("cos")), k)
  }

  /** The COMPLETE IVF-ANN chain — train / assign / probe / re-rank — in
    * one declarative plan (sim_centroids and blockedPairs exercise the
    * pieces; this is the end-to-end search a vector store runs):
    *
    *   1. TRAIN: per-label centroids as exact decimal lane means (the
    *      coarse quantizer; at a real deployment this is k-means — the
    *      label structure stands in for converged assignments, keeping the
    *      whole chain oracle-replayable);
    *   2. ASSIGN: every vector to its nearest centroid by cosine — the
    *      inverted file. Centroids are broadcast (they are O(cells), never
    *      data-sized); the scan stays partition-parallel;
    *   3. PROBE: each query picks its `nProbe` nearest cells — recall/cost
    *      dial of IVF (probing all cells degenerates to brute force);
    *   4. RE-RANK: exact cosine over ONLY the probed cells' members,
    *      per-query top-k. Work scales with |probed members|, not corpus.
    *
    * All ranks order on 6-dp-rounded scores with deterministic tiebreaks,
    * so the full chain hash-matches its SQL replay.
    */
  def ivfSearch(embeddings: DataFrame, nQueries: Int = 10, k: Int = 5,
                nProbe: Int = 2): DataFrame = {
    val (cent, assign) = ivfIndex(embeddings)
    ivfSearchFromIndex(embeddings, cent, assign, nQueries, k, nProbe)
  }

  /** The IVF INDEX as data: (cell, cv) centroids + (vec_id, cell)
    * assignments — exactly what gets persisted so tomorrow's probes
    * never re-train ([[ivfSearchFromIndex]], `sim_index_search`).
    * Centroid lane means sum in exact decimal and freeze at 6 dp, so
    * the frames round-trip parquet bit-for-bit.
    */
  def ivfIndex(embeddings: DataFrame): (DataFrame, DataFrame) = {
    GraftFunctions.register(embeddings.sparkSession)
    val cent = embeddings
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos"),
        col("col").cast("double").cast("decimal(18,9)").as("val"))
      .groupBy("label", "pos")
      .agg((sum(col("val")).cast("double") / count(lit(1))).as("c"))
      .select(col("label"), col("pos"), round(col("c"), 6).as("c"))
      .groupBy("label")
      .agg(F.transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("cv"))
    val centAsCell = cent.withColumnRenamed("label", "cell")
    (centAsCell, assignToCentroids(embeddings, centAsCell))
  }

  /** Nearest-centroid assignment of `vectors` (vec_id, embedding) against
    * FROZEN `cent` (cell, cv) — the incremental-maintenance primitive:
    * because the centroids are an input, not retrained, assigning arrivals
    * batch-by-batch is bit-identical to assigning the whole corpus in one
    * pass, whatever the arrival order (`sim_index_stream`'s differential
    * gate). Centroids broadcast; ties break on cell.
    */
  def assignToCentroids(vectors: DataFrame, cent: DataFrame): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)
    val e = vectors.select(col("vec_id"), col("embedding").as("v"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("acos"), col("cell"))
    e.crossJoin(broadcast(cent.select(col("cell"), col("cv"))))
      .select(col("vec_id"), col("cell"), cosD(col("v"), col("cv")).as("acos"))
      .withColumn("_rn", row_number().over(wAssign)).filter(col("_rn") === 1)
      .select(col("vec_id"), col("cell"))
  }

  /** IVF probe + exact re-rank against a STORED index — `cent` and
    * `assign` typically read back from tables ([[ivfIndex]] wrote them);
    * only the re-rank touches the embedding column. Must produce the
    * bit-identical ranking as [[ivfSearch]]'s train-inline path — the
    * differential gate for ANN index persistence.
    */
  def ivfSearchFromIndex(embeddings: DataFrame, cent: DataFrame,
                         assign: DataFrame, nQueries: Int = 10, k: Int = 5,
                         nProbe: Int = 2): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
    ivfProbeRank(e, cent, assign, nQueries, k, nProbe)
  }

  /** Steps 3–4 of the IVF chain (probe + exact re-rank), shared by the
    * label-trained [[ivfSearch]] and the k-means-trained
    * [[ivfSearchKMeans]]. `cent` = (cell, cv); `assign` = (vec_id, cell);
    * `e` = (vec_id, v). Centroids broadcast (O(cells) rows); re-rank work
    * scales with the probed cells' member count, not the corpus.
    */
  private def ivfProbeRank(e: DataFrame, cent: DataFrame, assign: DataFrame,
                           nQueries: Int, k: Int, nProbe: Int): DataFrame = {
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wProbe = Window.partitionBy("query_id").orderBy(desc("qcos"), col("cell"))
    val probes = q.crossJoin(broadcast(cent))
      .select(col("query_id"), col("qv"), col("cell"),
        cosD(col("qv"), col("cv")).as("qcos"))
      .withColumn("_rn", row_number().over(wProbe)).filter(col("_rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    topKExact(
      probes.join(assign, "cell")
        .filter(col("vec_id") =!= col("query_id"))
        .join(e, "vec_id")
        .select(col("query_id"), col("vec_id"),
          round(cosFused(col("qv"), col("v")), 6).as("cos")), k)
  }

  /** Spherical k-means (Lloyd iterations under cosine assignment) over the
    * embedding column — the REAL coarse-quantizer trainer whose converged
    * assignments [[ivfSearch]]'s label column stands in for. Returns the
    * trained codebook as (cell: int, cv: array&lt;double&gt;).
    *
    * Deterministic by construction, with no RNG and no dependence on
    * partitioning: init = the `k` lowest-vec_id vectors (seeding by data
    * order, not sampling); each iteration assigns map-side (centroids are
    * a literal — an array_max over (cos, cell) structs, zero shuffle) and
    * recomputes means via ONE hash aggregate whose lane sums are exact
    * decimals, so the mean is identical regardless of partition order.
    * The driver holds only model state: O(k·dim) values per iteration
    * (the same boundedness argument as mllib's KMeans reduce), never data.
    * Empty cells keep their previous centroid. Stops when no lane moves
    * more than `tol` or after `maxIter` rounds.
    *
    * `init = "order"` seeds from the `k` lowest-vec_id vectors (one pass);
    * `init = "pp"` is k-means++ D²-weighted seeding made deterministic
    * WITHOUT an RNG via the exponential-race trick: each point's sampling
    * key is d²(x) / −ln(u(x)) where u(x) is a uniform derived from
    * xxhash64(vec_id, round) — argmax of the key is a categorical draw
    * with P(x) ∝ d²(x), the k-means++ distribution, yet the same data
    * always picks the same seeds. One extra pass per seed (k passes,
    * each a map-side score + single max-struct aggregate, no shuffle of
    * data rows); worth it when data-order seeding lands several seeds in
    * one dense region and Lloyd stalls in that local optimum.
    */
  def kmeansCentroids(embeddings: DataFrame, k: Int = 8, maxIter: Int = 10,
                      tol: Double = 1e-9, init: String = "order"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxIter >= 1, "maxIter must be >= 1")
    require(init == "order" || init == "pp", s"unknown init: $init")
    import graft.functions.VectorFunctions.{dot => hdot}
    val e = embeddings.select(col("vec_id"),
      F.transform(col("embedding"), _.cast("double")).as("v"))
    var cents: Array[Array[Double]] =
      if (init == "order")
        e.orderBy("vec_id").limit(k)
          .select("v").collect().map(_.getSeq[Double](0).toArray)
      else {
        val seeds = scala.collection.mutable.ArrayBuffer(
          e.orderBy("vec_id").limit(1)
            .select("v").collect().map(_.getSeq[Double](0).toArray): _*)
        var exhausted = seeds.isEmpty
        while (seeds.size < k && !exhausted) {
          val centLit = typedLit(seeds.map(_.toSeq).toSeq)
          // angular distance to the nearest seed: d = 1 − max cosine
          // (zero vectors coalesce to cosine −1 → d = 2, sampleable)
          val maxCos = array_max(F.transform(centLit, cv =>
            coalesce(hdot(col("v"), cv) /
              nullif(sqrt(hdot(col("v"), col("v"))) * sqrt(hdot(cv, cv)),
                lit(0.0)), lit(-1.0))))
          val d2 = (lit(1.0) - maxCos) * (lit(1.0) - maxCos)
          // u ∈ (0,1): 52 hash bits, shifted off zero and one
          val u = (pmod(xxhash64(col("vec_id"), lit(seeds.size)),
            lit(1L << 52)).cast("double") + 1.0) / lit((1L << 52).toDouble + 2.0)
          val key = d2 / -log(u)
          val best = e.select(struct(key.as("key"),
            (-col("vec_id")).as("nid"), col("v")).as("s"))
            .agg(max(col("s")).as("s")).select("s.key", "s.v").head()
          // key 0 = every remaining point coincides with a seed — stop
          if (best.isNullAt(0) || best.getDouble(0) <= 0.0) exhausted = true
          else seeds += best.getSeq[Double](1).toArray
        }
        seeds.toArray
      }
    require(cents.nonEmpty, "kmeansCentroids needs at least one vector")
    var moved = Double.MaxValue
    var it = 0
    while (it < maxIter && moved > tol) {
      val centLit = typedLit(cents.map(_.toSeq).toSeq)
      // nearest centroid, map-side: max over (cosine, -cell) structs —
      // ties break toward the lowest cell; a zero vector (null cosine)
      // coalesces below any real score so it still lands deterministically
      // inside a lambda the analyzer strips struct-field aliases to
      // col1/col2 — address the negated-cell field positionally
      val scored = F.transform(centLit, (cv, i) =>
        struct(coalesce(hdot(col("v"), cv) /
          nullif(sqrt(hdot(col("v"), col("v"))) * sqrt(hdot(cv, cv)),
            lit(0.0)), lit(-2.0)), -i))
      val cell = (-array_max(scored).getField("col2")).cast("int")
      val sums = e.select(cell.as("cell"), posexplode(col("v")))
        .groupBy("cell", "pos")
        .agg(sum(col("col").cast("decimal(28,12)")).as("s"),
          count(lit(1)).as("n"))
        .collect() // bounded: k × dim model rows, not data
      val next = cents.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getDecimal(2).doubleValue() / r.getLong(3)
      }
      moved = cents.zip(next).map { case (a, b) =>
        a.zip(b).map(t => math.abs(t._1 - t._2)).max
      }.max
      cents = next
      it += 1
    }
    val sess = embeddings.sparkSession
    import sess.implicits._
    cents.zipWithIndex.map { case (cv, i) => (i, cv.toSeq) }.toSeq
      .toDF("cell", "cv")
  }

  /** [[ivfSearch]] with a REAL trained coarse quantizer: cells come from
    * [[kmeansCentroids]] instead of the label column. SQL-replayable after
    * all (disproving this doc's earlier claim): Lloyd with ordered init,
    * exact decimal lane sums, and a total-order assignment tie-break is a
    * pure function of the corpus, so [[kmeansOracleCtes]] unrolls the
    * iterations as MATERIALIZED CTE blocks — the [[LogReg.oracleCtes]]
    * discipline. Pass `tol = 0.0` for replay parity: the unrolled oracle
    * always runs `maxIter` blocks, and with tol=0 early stop fires only
    * at a bit-exact fixpoint, where extra iterations are bit-exact
    * no-ops in both engines. SimilaritySpec keeps the semantic gates:
    * run-to-run-deterministic training, full-probe ≡ exact brute-force
    * top-k, recall growing with `nProbe`.
    */
  def ivfSearchKMeans(embeddings: DataFrame, nCells: Int = 8,
                      nQueries: Int = 10, k: Int = 5, nProbe: Int = 2,
                      maxIter: Int = 10, tol: Double = 1e-9): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val cent = kmeansCentroids(embeddings, nCells, maxIter, tol)
    val e = embeddings.select(col("vec_id"), col("embedding").as("v"))
    val wAssign = Window.partitionBy("vec_id").orderBy(desc("acos"), col("cell"))
    val assign = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cell"), cosD(col("v"), col("cv")).as("acos"))
      .withColumn("_rn", row_number().over(wAssign)).filter(col("_rn") === 1)
      .select(col("vec_id"), col("cell"))
    ivfProbeRank(e, cent, assign, nQueries, k, nProbe)
  }

  /** DuckDB replay of [[kmeansCentroids]] (init = "order", tol = 0.0):
    * `maxIter` unrolled Lloyd blocks over the `embeddings` table. Each
    * block re-derives the centroid lists (`centl`), assigns every vector
    * map-style via the same unrounded cosine with the (cos desc, cell
    * asc) total order (`list_dot_product` is bit-equal to
    * [[VectorFunctions.dot]]'s left-to-right double fold), and recomputes
    * lane means with the SAME exact-DECIMAL(28,12) sums — order-free, so
    * the mean double is identical regardless of either engine's
    * aggregation order; empty cells keep the previous centroid via the
    * LEFT JOIN coalesce. The chain ends in `kcent` = (cell,
    * cv array&lt;double&gt;), plus `e` = (vec_id, v) for downstream reuse.
    */
  def kmeansOracleCtes(k: Int, maxIter: Int): String = {
    def cos(a: String, b: String) =
      s"list_dot_product($a, $b) / nullif(sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)), 0.0)"
    val ctes = Seq.newBuilder[String]
    ctes += """e AS MATERIALIZED (
              |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings)""".stripMargin
    ctes += """ex AS MATERIALIZED (
              |  SELECT vec_id, generate_subscripts(embedding, 1) AS idx,
              |         CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)""".stripMargin
    ctes += s"""seeds AS (
               |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
               |  FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT $k))""".stripMargin
    ctes += "cent0 AS MATERIALIZED (SELECT s.cell, u.idx, u.x AS c FROM seeds s JOIN ex u USING (vec_id))"
    for (t <- 1 to maxIter) {
      val p = t - 1
      ctes += s"""centl$p AS (SELECT cell, list(c ORDER BY idx) AS cv FROM cent$p GROUP BY cell),
                 |asg$t AS MATERIALIZED (
                 |  SELECT vec_id, cell FROM (
                 |    SELECT e.vec_id, c.cell,
                 |           row_number() OVER (PARTITION BY e.vec_id
                 |             ORDER BY coalesce(${cos("e.v", "c.cv")}, -2.0) DESC, c.cell) AS rn
                 |    FROM e CROSS JOIN centl$p c) WHERE rn = 1),
                 |mean$t AS (
                 |  SELECT a.cell, u.idx,
                 |         CAST(sum(CAST(u.x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
                 |  FROM asg$t a JOIN ex u USING (vec_id) GROUP BY 1, 2),
                 |cent$t AS MATERIALIZED (
                 |  SELECT c.cell, c.idx, coalesce(m.m, c.c) AS c
                 |  FROM cent$p c LEFT JOIN mean$t m ON c.cell = m.cell AND c.idx = m.idx)""".stripMargin
    }
    ctes += s"kcent AS MATERIALIZED (SELECT cell, list(c ORDER BY idx) AS cv FROM cent$maxIter GROUP BY cell)"
    ctes.result().mkString(",\n")
  }

  /** LSH-bucketed near-neighbor pairs: `nPlanes`-bit signature, banded into
    * `bands` chunks; banded candidates re-scored exactly, kept at cosine ≥
    * `minCos`. Output ⊆ [[bruteForcePairs]] output (recall < 1 by design).
    */
  def lshPairs(embeddings: DataFrame, dim: Int = 64, nPlanes: Int = 16,
               bands: Int = 4, minCos: Double = 0.4): DataFrame = {
    val cand = lshCandidates(embeddings, dim, nPlanes, bands)
    // low-τ banding makes every vector appear in MANY candidate pairs
    // (narrow bands ⇒ candidate mass ≫ final pairs), so norms precomputed
    // once per vector amortize across all of a vector's candidates — the
    // pair stage pays one dot, not three. cosinePre is double-identical
    // to the fused form (same sqrt, same multiply), so oracle parity and
    // the ⊆-brute-force guarantee are unchanged.
    val slim = prep(embeddings)
    val ea = slim.select(col("vec_id").as("a"), col("v").as("va"),
      col("nrm").as("na"))
    val eb = slim.select(col("vec_id").as("b"), col("v").as("vb"),
      col("nrm").as("nb"))
    cand.join(ea, "a").join(eb, "b")
      .select(col("a"), col("b"),
        round(cosinePre(dotFast(col("va"), col("vb")),
          col("na"), col("nb")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** The banded candidate stage of [[lshPairs]] alone — distinct (a, b)
    * pairs colliding in ≥ 1 band, BEFORE exact verification. Exposed
    * (package-private) so SimilaritySpec can assert the candidate-mass
    * contract the scale story rests on: in the production regime (wide
    * bands, high τ) candidates are ~n·bands, while narrow-band low-τ
    * parameterizations degrade toward all pairs on near-orthogonal data.
    */
  private[graft] def lshCandidates(embeddings: DataFrame, dim: Int,
                                   nPlanes: Int, bands: Int): DataFrame = {
    require(nPlanes % bands == 0)
    val width = nPlanes / bands
    val mask = (1L << width) - 1
    val planes = VectorFunctions.hyperplanes(nPlanes, dim)
    val sigExpr = planes.zipWithIndex.map { case (coefs, p) =>
      when(dotFast(col("v"), typedLit(coefs)) > 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = prep(embeddings).withColumn("sig", sigExpr)
    val chunks = (0 until bands).map(c =>
      struct(lit(c).as("c"),
        shiftright(col("sig"), c * width).bitwiseAND(lit(mask)).as("h")))
    val banded = sig
      .select(col("vec_id"), col("v"), explode(array(chunks: _*)).as("b"))
      .select(col("vec_id"), col("v"), col("b.c").as("c"), col("b.h").as("h"))
    banded.as("x").join(banded.as("y"),
        col("x.c") === col("y.c") && col("x.h") === col("y.h") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
      .distinct()
  }
}
