package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** PageRank invariants a replay can't certify: mass conservation on a
  * symmetric graph, the analytic uniform fixed point, weight sensitivity,
  * and partitioning-independence (the oracle only pins one plan's output;
  * these pin the math).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Long)], iters: Int = 5) =
    PageRank.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
      iters = iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("symmetric regular graph lands the uniform fixed point exactly") {
    // 3-cycle read both ways: every node has equal in/out weight, so the
    // uniform start IS the fixed point — any iteration count returns 1/3
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
      .flatMap { case (u, v) => Seq((u, v, 1L), (v, u, 1L)) }
    val r = ranksOf(edges)
    assert(r.size == 3)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("mass is conserved on a symmetric graph (no dangling leak)") {
    val edges = Seq(("a", "b", 3L), ("b", "a", 3L), ("b", "c", 1L),
      ("c", "b", 1L), ("c", "d", 2L), ("d", "c", 2L))
    val total = ranksOf(edges).values.sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
  }

  test("heavier in-links rank higher; weights matter") {
    // hub b receives from everyone; weight skew pushes c above d
    val edges = Seq(
      ("a", "b", 1L), ("b", "a", 1L),
      ("c", "b", 1L), ("b", "c", 9L),
      ("d", "b", 1L), ("b", "d", 1L))
    val r = ranksOf(edges)
    assert(r("b") > r("a") && r("b") > r("c") && r("b") > r("d"))
    assert(r("c") > r("d"), s"weighted edge must lift c: $r")
  }

  test("result is independent of input partitioning") {
    val edges = Seq(("a", "b", 2L), ("b", "a", 2L), ("b", "c", 1L),
      ("c", "b", 1L), ("a", "c", 1L), ("c", "a", 1L))
    val df1 = edges.toDF("src", "dst", "w").repartition(1)
    val df7 = edges.toDF("src", "dst", "w").repartition(7, col("dst"))
    val r1 = PageRank.pageRank(df1, "src", "dst", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r7 = PageRank.pageRank(df7, "src", "dst", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // contribution sums may associate differently across partitionings;
    // equality up to 1e-12 is the partitioning-independence contract
    assert(r1.keySet == r7.keySet)
    r1.foreach { case (k, v) => assert(math.abs(v - r7(k)) < 1e-12) }
  }
}
