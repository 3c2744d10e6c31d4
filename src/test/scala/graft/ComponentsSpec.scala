package graft

import org.apache.spark.sql.functions._

import graft.operators.Components

/** Connected-components contracts: transitive collapse, multiple
  * components, chain depth (the compression hop must beat O(diameter)
  * within maxIter), and the self-cluster for un-paired docs.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive pairs collapse to one cluster under the min id") {
    // a~b, b~c but never a~c — the exact under-delete pairs alone cause
    val out = cc((2L, 3L), (3L, 7L), (10L, 11L))
    assert(out == Map(2L -> 2L, 3L -> 2L, 7L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("a 64-node chain converges (compression beats O(diameter))") {
    val chain = (0L until 63L).map(i => (i, i + 1))
    val out = cc(chain: _*)
    assert(out.values.toSet == Set(0L))
    assert(out.size == 64)
  }

  test("clusters() gives un-paired docs their own id") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val pairs = Seq((2L, 4L)).toDF("a", "b")
    val out = Components.clusters(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 2L))
  }

  test("empty edge set returns an empty labeling") {
    val out = Components.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(out.isEmpty)
  }

  test("2-core: chains peel entirely, cycles survive, tails strip") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),             // pure chain: all peel
      (10L, 11L), (11L, 12L), (10L, 12L),       // triangle: all survive
      (20L, 21L), (21L, 22L), (20L, 22L), (22L, 23L) // triangle + tail
    ).toDF("a", "b")
    val got = Components.twoCore(edges)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 23L).forall(!got(_)),
      "chain nodes and the tail must peel away")
    assert(Seq(10L, 11L, 12L, 20L, 21L, 22L).forall(got(_)),
      "cycle members must survive")
    // 8 rounds is a fixed point here AND on the declared corpus graph
    val more = Components.twoCore(edges, rounds = 9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == more)
    val docs = Tables.documents(spark, sf("sf0.01"))
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, n = 3, minJaccard = 0.5).select("a", "b").localCheckpoint(true)
    val r8 = Components.twoCore(pairs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val r9 = Components.twoCore(pairs, rounds = 9).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(r8 == r9, "8 peels must reach the corpus graph's fixed point")
  }

  test("LPA splits bridge-welded blobs that components merge") {
    // two triangles joined by ONE borderline edge (3~10): reachability
    // welds them into one cluster; the closed-neighborhood majority vote
    // outvotes the bridge and keeps them separate. Hand-traced labels:
    // r1 {1,2,3}→1 (min ties), 10→3 (min over all-1 counts), 11/12→10;
    // r2 flips 10 to the blob majority 10; r3 is the fixed point.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 10L), (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val comp = Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet == Set(1L), "components weld across the bridge")
    val lpa = Components.labelPropagation(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L),
      s"LPA must keep the blobs separate, got $lpa")
    // determinism: a different input partitioning lands identical labels
    val lpa2 = Components.labelPropagation(edges.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa2 == lpa)
  }

  test("LPA: an isolated pair settles on the min label (self-vote, no oscillation)") {
    val lpa = Components.labelPropagation(Seq((8L, 5L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lpa == Map(5L -> 5L, 8L -> 5L))
    val out = Components.communities(
      Seq(1L, 5L, 8L).toDF("doc_id"), Seq((8L, 5L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 5L, 8L -> 5L),
      "un-paired docs keep their own community id")
  }

  test("modularity: hand-checked Q on the bridged-triangles graph") {
    // m=7. One-blob partition: Q = m_c/m − (d_c/2m)² = 1 − 1 = 0.
    // Split partition: per triangle m_c=3, d_c=7 →
    // Q = 2·(3/7 − (7/14)²) = 70/196 = 0.357143 (6 dp).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (3L, 10L), (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 12L)
    val one = ids.map(_ -> 1L).toDF("id", "lab")
    val split = ids.map(i => i -> (if (i < 10L) 1L else 10L)).toDF("id", "lab")
    val q1 = Components.modularity(edges, one).collect().head
    assert(q1.getLong(0) == 1L && q1.getDouble(1) == 0.0)
    val q2 = Components.modularity(edges, split).collect().head
    assert(q2.getLong(0) == 2L && q2.getDouble(1) == 0.357143,
      s"got ${q2.getDouble(1)}")
    // the better-cut partition scores strictly higher — the referee works
    assert(q2.getDouble(1) > q1.getDouble(1))
  }

  test("LPA: 4 rounds is the fixed point on the declared corpus pair graph") {
    val docs = Tables.documents(spark, sf("sf0.01"))
    val pairs = graft.operators.Dedup.ngramJaccardPairs(
      docs, n = 3, minJaccard = 0.5).select("a", "b").localCheckpoint(true)
    val r4 = Components.labelPropagation(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r5 = Components.labelPropagation(pairs, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r4 == r5, "4 rounds must reach the corpus graph's fixed point")
  }

  test("linkPredict: square finds both diagonals, triangle finds nothing") {
    // 4-cycle 1-2-3-4-1: non-edges (1,3) and (2,4) each share BOTH
    // square corners → common=2, all degrees 2 → jaccard 2/(2+2−2)=1.0
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = Components.linkPredict(square)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)), s"got $got")
    // triangle: every distance-2 pair is already an edge → empty
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Components.linkPredict(tri).isEmpty)
    // path 1-2-3: (1,3) has only ONE common neighbor — below minCommon=2,
    // present at minCommon=1 with jaccard 1/(1+1−1)=1.0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Components.linkPredict(path).isEmpty)
    val loose = Components.linkPredict(path, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(loose == Set((1L, 3L, 1L, 1.0)))
  }

  test("linkPredict: hub middles above the degree cap emit no candidates") {
    // star center 100 connects 1..5; through-hub pairs vanish once the
    // hub exceeds the cap, and degrees stay EXACT (pre-cap) — the
    // hot-shingle honesty contract
    val star = (1L to 5L).map(i => (100L, i)).toDF("a", "b")
    val open = Components.linkPredict(star, minCommon = 1, maxDegree = None)
      .collect()
    assert(open.length == 10, "5-leaf star has C(5,2) through-hub pairs")
    assert(Components.linkPredict(star, minCommon = 1,
      maxDegree = Some(4)).isEmpty, "capped hub emits nothing")
  }

  test("one action per round: only checkpoint materializations, no isEmpty/count probes") {
    val names = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = names.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val out = cc((2L, 3L), (3L, 7L), (10L, 11L))
      assert(out.values.toSet == Set(2L, 10L))
      // listener delivery is async — poll until the event stream quiesces
      val deadline = System.currentTimeMillis() + 15000
      var snapshot = List.empty[String]
      var stable = false
      while (!stable && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        val cur = names.toArray.map(_.toString).toList
        stable = cur == snapshot && cur.nonEmpty
        snapshot = cur
      }
      // the loop's only driver actions are the checkpoint materializations
      // (plus this test's own collect); the convergence metric rides them
      val loopActions = snapshot.filterNot(_ == "collect").toSet
      assert(loopActions.nonEmpty &&
        loopActions.subsetOf(Set("checkpoint", "localCheckpoint")),
        s"unexpected per-round actions: $snapshot")
    } finally spark.listenerManager.unregister(l)
  }
}
