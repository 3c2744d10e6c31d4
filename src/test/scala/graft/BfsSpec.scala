package graft

import org.apache.spark.sql.functions._

import graft.operators.Bfs

/** BFS hop distance: hand-checked small graph, BFS invariants, and the
  * frontier-relaxation == shortest-path property on a cyclic graph.
  */
class BfsSpec extends SparkSpec {

  import spark.implicits._

  test("hand-checked chain with a shortcut and a cycle") {
    //  1→2→3→4→5, 1→4 shortcut, 5→1 closes a cycle; 9→9 self-loop island
    val edges = Seq((1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (5, 1), (9, 9))
      .toDF("src", "dst")
    val seeds = Seq(1).toDF("node")
    val got = Bfs.hopDistance(edges, seeds, maxHops = 4)
      .as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 0L, 2 -> 1L, 4 -> 1L, 3 -> 2L, 5 -> 2L))
  }

  test("depth-k frontier only reachable via k edges; maxHops truncates") {
    val edges = Seq((1, 2), (2, 3), (3, 4)).toDF("src", "dst")
    val seeds = Seq(1).toDF("node")
    val d2 = Bfs.hopDistance(edges, seeds, maxHops = 2)
      .as[(Int, Long)].collect().toMap
    assert(d2 === Map(1 -> 0L, 2 -> 1L, 3 -> 2L))
    assert(!d2.contains(4), "node beyond maxHops must be absent")
  }

  test("multi-source: distance is min over seeds") {
    val edges = Seq((1, 2), (2, 3), (3, 4), (10, 4)).toDF("src", "dst")
    val seeds = Seq(1, 10).toDF("node")
    val got = Bfs.hopDistance(edges, seeds, maxHops = 3)
      .as[(Int, Long)].collect().toMap
    assert(got(4) === 1L, "shortcut from seed 10 must win")
    assert(got(3) === 2L)
  }

  test("every (node, depth) row is unique and depth ≤ maxHops") {
    val pairs = Tables.lineitem(spark, sf("sf0.001"))
      .join(Tables.orders(spark, sf("sf0.001")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = pairs.unionAll(pairs.select(col("dst"), col("src")))
    val seeds = Seq("s1").toDF("node")
    val rows = Bfs.hopDistance(edges, seeds, maxHops = 4)
      .as[(String, Long)].collect()
    assert(rows.map(_._1).distinct.length === rows.length)
    assert(rows.forall(_._2 <= 4))
    assert(rows.exists(_._2 > 0), "seed must reach at least one neighbor")
  }
}
