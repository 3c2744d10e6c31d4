package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Product-quantization contract: codebook shape, deterministic
  * train/encode, exact-reconstruction on a cluster-separable corpus, and
  * recall of ADC+rerank search against the exact L2 top-k baseline.
  */
class PqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf("sf0.001"))

  test("codebooks have shape m x ksub x d/m and train deterministically") {
    val b1 = Pq.trainCodebooks(emb, m = 8, ksub = 16, maxIter = 3)
    val b2 = Pq.trainCodebooks(emb, m = 8, ksub = 16, maxIter = 3)
    assert(b1.length == 8 && b1.forall(_.length == 16) &&
      b1.forall(_.forall(_.length == 8)))
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq)
  }

  test("encode assigns every vector m codes within [0, ksub)") {
    val books = Pq.trainCodebooks(emb, m = 8, ksub = 16, maxIter = 3)
    val codes = Pq.encode(emb, books).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
  }

  // maxIter = 3 everywhere below: the contracts (determinism, probe
  // monotonicity, recall floors) are iteration-agnostic, and each extra
  // Lloyd round costs seconds of DRIVER expression-compile per training —
  // this spec trains codebooks 3x coarse + 24x subspace per run
  test("IVF-PQ probes cells only, stays deterministic, and recalls the exact top-k") {
    import spark.implicits._
    val run1 = Pq.ivfPqSearch(emb, nCells = 4, m = 8, ksub = 16,
      nQueries = 10, k = 5, nProbe = 2, rerank = 64, maxIter = 3)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    val run2 = Pq.ivfPqSearch(emb, nCells = 4, m = 8, ksub = 16,
      nQueries = 10, k = 5, nProbe = 2, rerank = 64, maxIter = 3)
      .select("query_id", "rank", "vec_id").as[(Long, Long, Long)]
      .collect().toSeq.sorted
    assert(run1 == run2) // pure function of the corpus
    assert(run1.map(_._1).distinct.size == 10)
    // recall vs exact L2 top-5 — probing 2 of 4 cells loses the
    // candidates in unprobed cells by design, so the bar sits below
    // the flat-PQ gate; the full-probe run must dominate the 2-probe run
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val dd = aggregate(zip_with(col("v"), col("qv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    val we = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("_d").asc, col("vec_id").asc)
    val exact = e.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .withColumn("_d", dd)
      .withColumn("_rn", row_number().over(we)).filter(col("_rn") <= 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val got = run1.map(t => (t._1, t._3)).toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.4, f"IVF-PQ 2/4-probe recall $recall%.3f below 0.4")
    val full = Pq.ivfPqSearch(emb, nCells = 4, m = 8, ksub = 16,
      nQueries = 10, k = 5, nProbe = 4, rerank = 64, maxIter = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val fullRecall = (full intersect exact).size.toDouble / exact.size
    assert(fullRecall >= recall,
      f"full-probe recall $fullRecall%.3f below 2-probe $recall%.3f")
  }

  test("ADC search with rerank recalls the exact L2 top-k") {
    import spark.implicits._
    val books = Pq.trainCodebooks(emb, m = 8, ksub = 16, maxIter = 3)
    val pq = Pq.search(emb, books, nQueries = 10, k = 5, rerank = 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // exact L2 top-5 baseline
    val e = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val d2 = aggregate(zip_with(col("v"), col("qv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("_d").asc, col("vec_id").asc)
    val exact = e.crossJoin(q).filter(col("vec_id") =!= col("query_id"))
      .withColumn("_d", d2)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.7,
      f"PQ recall $recall%.3f vs exact L2 top-5 below 0.7 " +
        s"(|pq|=${pq.size}, |exact|=${exact.size})")
    // exact re-rank means every returned distance is the true L2
    val maxAdcErr = Pq.search(emb, books, nQueries = 3, k = 3, rerank = 10)
      .select((abs(col("adc_d2") - col("d2")) / col("d2")).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    // ADC is approximate but must be in the right ballpark
    assert(maxAdcErr < 1.0, s"ADC relative error $maxAdcErr unreasonable")
  }
}
