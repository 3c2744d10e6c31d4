package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the pair→cluster
  * step every production dedup pipeline needs between "near-dup pairs" and
  * "keep one doc per duplicate group" (pairs alone under-delete: a~b, b~c
  * must collapse a,b,c together even when a~c was never emitted).
  *
  * Algorithm: iterative min-label propagation with pointer compression —
  * each round every node takes the min component label among itself and its
  * neighbors (one shuffle: edge⋈label + min-agg), then labels are
  * compressed one pointer hop (label := label(label), a second equi-join).
  * The compression hop is what turns O(diameter) propagation into the
  * O(log n)-round regime of the small-star/large-star family (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC'14) for the
  * shallow, clustered graphs dedup produces.
  *
  * Scale notes: every step is an equi-join/agg on the node id (shuffle
  * keyed and AQE-coalesced); `localCheckpoint` after each round cuts the
  * iterative lineage so plan size stays constant. Convergence detection is
  * FREE: an `observe` metric (count of changed labels) rides the same
  * checkpoint materialization, so each round is exactly ONE driver action
  * — at 1000 executors the per-round driver round-trips, not the shuffles,
  * set the iteration floor. Skew = the largest component's star fan-in,
  * bounded by compression.
  */
object Components {

  /** (id, comp) for every node appearing in `edges`; comp = min node id in
    * the component. Nodes absent from `edges` are absent here — callers
    * left-join and coalesce to self (an un-paired doc is its own cluster).
    */
  def connectedComponents(edges: DataFrame, aCol: String = "a",
                          bCol: String = "b", maxIter: Int = 25): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .localCheckpoint(true) // edges re-read every round: materialize once
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var round = 0
    var changed = true // an empty graph settles in its first (cheap) round
    while (changed && round < maxIter) {
      // propagate: min neighbor label
      val nbr = und
        .join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("comp").as("nc"))
      val prop = labels.join(nbr, Seq("id"), "left").select(
        col("id"), col("comp").as("prev"),
        least(col("comp"), coalesce(col("nc"), col("comp"))).as("mid"))
      // compress: one pointer hop, label := label(label)
      val hop = prop.select(col("id").as("mid"), col("mid").as("hopped"))
        .groupBy("mid").agg(min("hopped").as("hc"))
      // the changed-count metric rides the checkpoint materialization
      // (Dataset.localCheckpoint is a query action, so observe fires):
      // one driver action per round, convergence probe included
      val obs = new org.apache.spark.sql.Observation(s"cc_r${round}_${java.util.UUID.randomUUID().toString.take(8)}")
      val next = prop.join(hop, Seq("mid"), "left").select(
        col("id"), col("prev"),
        least(col("mid"), coalesce(col("hc"), col("mid"))).as("comp"))
        .observe(obs, coalesce(sum(when(col("comp") =!= col("prev"), 1L)
          .otherwise(0L)), lit(0L)).as("n_changed"))
        .select("id", "comp")
        .localCheckpoint(true)
      changed = obs.get("n_changed").asInstanceOf[Long] > 0L
      labels = next
      round += 1
    }
    require(!changed, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Cluster assignment for a document corpus: connected components over
    * near-dup `pairs` (a, b), every doc keeps a cluster id (its own id when
    * un-paired). The keeper per cluster is `cluster_id` itself — min id,
    * consistent with [[Dedup.exact]]'s keep-min rule.
    */
  def clusters(docs: DataFrame, pairs: DataFrame,
               idCol: String = "doc_id"): DataFrame = {
    val cc = connectedComponents(pairs)
    docs.select(col(idCol))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("cluster_id"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007) over
    * an undirected edge list — the granularity-robust alternative to
    * [[connectedComponents]] for near-dup clustering. Components merge
    * everything REACHABLE: one borderline bridge edge (a marginal 0.5-Jaccard
    * match between two otherwise-unrelated duplicate blobs) welds both blobs
    * into one cluster and over-deletes. LPA assigns each node the label most
    * frequent in its closed neighborhood, so a single bridge edge is
    * outvoted by either blob's internal edges — bridged blobs KEEP separate
    * labels while each dense blob still collapses to one.
    *
    * Determinism contract (the oracle-replay discipline): exactly `rounds`
    * SYNCHRONOUS rounds (every node updates from the same previous-round
    * frame — no update-order dependence), the vote set is the node's own
    * label plus one vote per neighbor (the self-vote keeps an isolated pair
    * from oscillating forever under synchronous updates), and argmax ties
    * break to the MIN label via `min(struct(-count, label))`. All integer
    * arithmetic — the result is a pure function of the edge list.
    *
    * Scale shape: per round ONE shuffle join (edges ⋈ labels) + two
    * node-keyed hash aggregates, `localCheckpoint` cuts the iterative
    * lineage — same per-round cost as [[connectedComponents]] with the
    * min-agg swapped for a vote-count argmax. Near-dup graphs are shallow
    * dense blobs, so small fixed `rounds` reaches the fixed point (the
    * ComponentsSpec pins it on the declared corpus graph).
    */
  def labelPropagation(edges: DataFrame, aCol: String = "a",
                       bCol: String = "b", rounds: Int = 4): DataFrame = {
    val und = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("lab", col("id"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val nbrVotes = und
        .join(labels.select(col("id").as("dst"), col("lab")), Seq("dst"))
        .select(col("src").as("id"), col("lab"))
      labels = nbrVotes.unionAll(labels) // self-vote rides the same agg
        .groupBy("id", "lab").agg(count(lit(1)).as("c"))
        .groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("lab"))).as("m"))
        .select(col("id"), col("m.lab").as("lab"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Community assignment for a document corpus: LPA over near-dup `pairs`,
    * every doc gets a community id (its own id when un-paired) — the drop-in
    * sibling of [[clusters]] at finer, bridge-robust granularity.
    */
  def communities(docs: DataFrame, pairs: DataFrame,
                  idCol: String = "doc_id", rounds: Int = 4): DataFrame = {
    val lpa = labelPropagation(pairs, rounds = rounds)
    docs.select(col(idCol))
      .join(lpa.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lab"), col(idCol)).as("community_id"))
  }

  /** Newman modularity of a node partition: Q = Σ_c [m_c/m − (d_c/2m)²]
    * where m = undirected edge count, m_c = intra-community edges, d_c =
    * degree sum of community c. Computed as ONE exact integer numerator sum
    * — Σ_c (4·m·m_c − d_c²) — divided once by 4m² at the end, so no
    * float-summation-order hazard exists and the oracle replays the
    * identical division (the X264 decimal discipline applied to a graph
    * metric). Returns a single row (n_clusters, modularity ROUNDED 6 dp).
    *
    * `assign`: (node id, cluster label) — nodes absent from `edges`
    * contribute m_c = d_c = 0 and only affect n_clusters.
    *
    * Scale: two equi-joins of edges against the assignment + node/community
    * hash aggregates; the numerator fits a long far past any realistic m
    * (overflow at m ≈ 1.5e9 intra-edges in one community — switch the sum
    * to DECIMAL(38,0) before a graph that size).
    */
  def modularity(edges: DataFrame, assign: DataFrame,
                 aCol: String = "a", bCol: String = "b",
                 idCol: String = "id", labCol: String = "lab"): DataFrame = {
    val e = edges.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b")).localCheckpoint(true)
    val m = e.count() // one long of driver state — the |E| normalizer
    val asg = assign.select(col(idCol).cast("long").as("id"),
      col(labCol).cast("long").as("lab"))
    val withLabs = e
      .join(asg.select(col("id").as("a"), col("lab").as("la")), Seq("a"))
      .join(asg.select(col("id").as("b"), col("lab").as("lb")), Seq("b"))
    val intra = withLabs.filter(col("la") === col("lb"))
      .groupBy(col("la").as("lab")).agg(count(lit(1)).as("mc"))
    val deg = withLabs.select(col("la").as("lab"))
      .unionAll(withLabs.select(col("lb").as("lab")))
      .groupBy("lab").agg(count(lit(1)).as("dc"))
    // one frame carries every cluster (edge-free ones zero-filled), so a
    // single aggregate yields both n_clusters and the numerator sum
    val perC = asg.select(col("lab")).distinct()
      .join(intra, Seq("lab"), "left")
      .join(deg, Seq("lab"), "left")
      .select(col("lab"), coalesce(col("mc"), lit(0L)).as("mc"),
        coalesce(col("dc"), lit(0L)).as("dc"))
    perC.agg(
      count(lit(1)).as("n_clusters"),
      round(sum(lit(4L) * lit(m) * col("mc") - col("dc") * col("dc"))
        / (lit(4.0d) * lit(m.toDouble) * lit(m.toDouble)), 6).as("modularity"))
  }

  /** Common-neighbor link prediction over the near-dup pair graph — the
    * recall-repair step AFTER thresholding: a pair the Jaccard cut just
    * missed (0.48 vs 0.5) still tends to share many near-dup NEIGHBORS, so
    * distance-2 non-edges ranked by neighborhood overlap are the candidates
    * a curator re-verifies (the classic link-prediction baseline,
    * Liben-Nowell & Kleinberg 2003). Scores are INTEGER common-neighbor
    * counts plus a neighborhood Jaccard |N(a)∩N(b)| / |N(a)∪N(b)| — one
    * rounded division of exact integers, so the oracle replays identically
    * (no log-weighted Adamic-Adar: 1/ln(deg) sums are float-order-dependent
    * across engines).
    *
    * Plan: paths = und ⋈ und on the middle node (a < b kills mirror
    * duplicates), one (a,b) hash agg for the intersection count, two degree
    * joins for the union, anti-join drops existing edges. The middle-node
    * fan-out is the quadratic hazard — a hub of degree d emits d² candidate
    * pairs — so `maxDegree` excludes hub middles BEFORE the self-join
    * (degrees stay pre-cap, only the candidate space shrinks: the
    * [[Dedup]] hot-shingle-cap honesty contract; LOW-bias, never wrong
    * pairs).
    */
  def linkPredict(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                  minCommon: Int = 2,
                  maxDegree: Option[Int] = Some(1000)): DataFrame = {
    val und = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(pairs
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .localCheckpoint(true)
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val mid = maxDegree match { // hub middles out BEFORE the self-join
      case Some(cap) => und.join(
        deg.filter(col("deg") <= cap).select(col("id").as("src")), Seq("src"))
      case None => und
    }
    val cand = mid.select(col("src").as("w"), col("dst").as("a"))
      .join(mid.select(col("src").as("w"), col("dst").as("b")), Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    val nonEdge = cand.join(
      und.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"),
      "left_anti")
    nonEdge
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        round(col("common").cast("double") /
          (col("da") + col("db") - col("common")).cast("double"), 6)
          .as("nbr_jaccard"))
  }

  /** 2-core of the pair graph: synchronously peel degree-<2 nodes for
    * `rounds` rounds and report, per node, whether it survived. The
    * actionable refinement of the triangle diagnostic: a CHAIN of
    * borderline matches (a~b~c~d, no a~c) peels away entirely — collapse
    * decisions there are transitive guesses — while a transitively-dense
    * duplicate blob keeps a cycle and survives, where collapse is safe.
    * Fixed `rounds` (not run-to-convergence) keeps the output a pure
    * function of the edge list, replayable round-for-round in SQL; each
    * peel strips the graph's outermost leaf layer, so `rounds` bounds
    * the CHAIN DEPTH peeled, and near-dup graphs are shallow (the same
    * observation that bounds [[connectedComponents]]' rounds).
    *
    * Scale shape: one degree count (edge⋈alive semi-joins + node-keyed
    * agg) per round, checkpointed — never more state than the live node
    * set; rounds × (2 joins + 1 agg), all equi on the node id.
    */
  def twoCore(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
              rounds: Int = 8): DataFrame = {
    val und = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionAll(pairs
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .localCheckpoint(true)
    val nodes = und.select(col("src").as("id")).distinct()
      .localCheckpoint(true)
    var alive = nodes
    for (_ <- 1 to rounds) {
      alive = und
        .join(alive.select(col("id").as("src")), Seq("src"), "left_semi")
        .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("id")).agg(count(lit(1)).as("_deg"))
        .filter(col("_deg") >= 2).select("id")
        .localCheckpoint(true)
    }
    nodes.join(alive.withColumn("_in", lit(true)), Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("_in"), lit(false)).as("in_core"))
  }
}
