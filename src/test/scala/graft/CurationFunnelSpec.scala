package graft

/** The curation funnel must be monotone non-increasing stage over stage
  * and land, at its final stage, on exactly the corpus_clean survivor
  * set — the cross-gate tying the report to the pipeline it reports on.
  */
class CurationFunnelSpec extends SparkSpec {

  test("funnel monotone; final stage == corpus_clean survivors") {
    val dir = sf("sf0.001")
    val fun = SparkEntry.queries("corpus_filter_funnel")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(fun.keySet == Set(0L, 1L, 2L, 3L))
    (0L to 2L).foreach { i =>
      assert(fun(i)._1 >= fun(i + 1)._1,
        s"stage $i docs ${fun(i)._1} < stage ${i + 1} ${fun(i + 1)._1}")
      assert(fun(i)._2 >= fun(i + 1)._2)
    }
    assert(fun(0L)._1 > fun(3L)._1, "the fixture must actually attrit")
    val cleanN = SparkEntry.queries("corpus_clean")(spark, dir).count()
    assert(fun(3L)._1 == cleanN,
      s"funnel end ${fun(3L)._1} != corpus_clean $cleanN")
  }
}
