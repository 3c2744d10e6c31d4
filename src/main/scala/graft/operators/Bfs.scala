package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance over an edge list — the reachability
  * member of the graph family ([[PageRank]] centrality, [[Components]]
  * clusters, triangle counts). In a curation pipeline this is "blast
  * radius": every doc within k link-hops of a seed set (spam hubs,
  * benchmark pages, licensed domains) — the crawl-graph analogue of
  * [[Decontamination]]'s content-overlap screen.
  *
  * Scale shape: classic frontier-relaxation, `maxHops` rounds, each round
  * exactly one shuffle join (frontier onto edges by src — frontier is
  * O(V) worst case, AQE broadcasts small ones) plus one min-agg; visited
  * set stays distributed, `localCheckpoint` per round cuts lineage like
  * [[Components]]/[[PageRank]]. No driver-side data. Deterministic: hop
  * distance is a pure min, no tie-breaks anywhere.
  *
  * Frontier rule: a node relaxes at round k iff its first discovery was
  * round k (strictly shorter paths can't appear later — BFS invariant),
  * so every edge is traversed at most once per endpoint discovery and the
  * work per round is O(edges out of the new frontier).
  */
object Bfs {

  /** (node, depth) for every node within `maxHops` of `seeds`; seeds are
    * depth 0. `edges` is directed (src → dst) — symmetrize first for an
    * undirected walk.
    */
  def hopDistance(edges: DataFrame, seeds: DataFrame,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 30, "maxHops must be in [0, 30]")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(eager = false)
    var dist = seeds.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("depth"))
      .localCheckpoint(eager = false)
    var frontier = dist
    for (k <- 1 to maxHops) {
      val reached = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node")).distinct()
      // first-discovery only: drop anything already at depth < k
      val fresh = reached.join(dist.select(col("node").as("_seen")),
          reached("node") === col("_seen"), "left_anti")
        .select(col("node"), lit(k.toLong).as("depth"))
        .localCheckpoint(eager = false)
      dist = dist.unionAll(fresh).localCheckpoint(eager = false)
      frontier = fresh
    }
    dist
  }

  /** DuckDB replay: recursive walk bounded at `maxHops`, min depth per
    * node — the textbook formulation the operator's frontier relaxation
    * must agree with. `edgesCte` provides `e(src, dst)`, `seedsCte`
    * provides `seed(node)`.
    */
  def oracleSql(edgesCte: String, seedsCte: String, maxHops: Int): String =
    s"""WITH RECURSIVE $edgesCte,
       |$seedsCte,
       |walk(node, d) AS (
       |  SELECT node, 0 FROM seed
       |  UNION
       |  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
       |  WHERE w.d < $maxHops
       |)
       |SELECT node, CAST(min(d) AS BIGINT) AS depth
       |FROM walk GROUP BY node""".stripMargin
}
