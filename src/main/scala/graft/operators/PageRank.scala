package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted PageRank over an edge list — entity-importance scoring, the
  * graph-centrality member of the curation toolbox next to
  * [[Components]]: rank sources/domains by how much the interaction graph
  * points at them (the web-graph quality prior a crawl-scale corpus uses
  * to weight documents).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the transition matrix (`src, dst, p` with p = w/Σw_out) is computed
  *    ONCE — one agg + one join — and checkpointed; iterations reuse it.
  *  - each iteration is exactly one shuffle join (ranks onto edges by src,
  *    rank frame is O(V) — AQE broadcasts it when small) and one hash agg
  *    (contributions by dst). No driver-side data, no collect.
  *  - per-iteration `localCheckpoint` cuts lineage so K iterations stay K
  *    plans, not one 2^K-node plan (same discipline as
  *    [[Components.connectedComponents]]) — LAZY (`eager = false`): each
  *    rank frame feeds exactly one consumer, so the barriers materialize
  *    inside the one final job instead of K separate driver actions (the
  *    convergence-free fixed-K loop never needs to inspect a round).
  *
  * Semantics: standard damped PageRank on the weighted graph,
  * r'(v) = (1-d)/N + d * Σ_{u→v} r(u) * w(u,v)/W(u), uniform 1/N start,
  * EXACTLY `iters` iterations (deterministic function of the edge list —
  * no convergence test, so replays and oracles land identical results).
  * Dangling nodes (dst-only, no out-edges) leak their mass each step —
  * callers wanting the mass-conserving variant should symmetrize the edge
  * list first (an interaction graph read both ways has no dangling nodes
  * by construction).
  */
object PageRank {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    val src = col(srcCol).as("src")
    val dst = col(dstCol).as("dst")
    val w = col(weightCol).cast("double").as("w")
    val e = edges.select(src, dst, w)
    // transition probabilities: one agg + one join, computed once
    val outW = e.groupBy("src").agg(sum("w").as("w_out"))
    val trans = e.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("w_out")).as("p"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    val n = nodes.count()
    val jump = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = trans.join(ranks, trans("src") === ranks("node"))
        .groupBy("dst").agg(sum(col("p") * col("rank")).as("sum_in"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(jump) + lit(damping) * coalesce(col("sum_in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(false)
    }
    ranks
  }
}
