package graft

import org.apache.spark.sql.functions._

/** Invariants of Pca.topKComponents on an exactly-diagonalizable corpus:
  * embeddings are scaled Walsh sign patterns, so the Gram matrix is
  * diag(16n, 4n, n, n/4) by construction and the true components are the
  * coordinate axes with well-separated eigenvalues ((λ2/λ1)^12 ≈ 6e-8 —
  * 12 power iterations converge far past the asserted tolerances).
  */
class PcaSpec extends SparkSpec {

  // Walsh functions w_k(i) = (-1)^bit_k(i): exactly orthogonal over i<64
  private def walsh(k: Int, i: Int): Float =
    if (((i >> k) & 1) == 0) 1.0f else -1.0f

  private lazy val emb = {
    import spark.implicits._
    (0 until 64).map { i =>
      (i.toLong, Array(4f * walsh(0, i), 2f * walsh(1, i),
        1f * walsh(2, i), 0.5f * walsh(3, i)))
    }.toDF("vec_id", "embedding")
  }

  private lazy val pcs = operators.Pca
    .topKComponents(spark, emb, "embedding", k = 3, iters = 12)
    .collect()
    .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

  test("components are the coordinate axes in eigenvalue order") {
    for ((pc, axis) <- Seq((1, 0), (2, 1), (3, 2)); idx <- 0 until 4) {
      val expected = if (idx == axis) 1.0 else 0.0
      assert(math.abs(pcs((pc, idx)) - expected) < 1e-6,
        s"pc$pc component $idx: ${pcs((pc, idx))}")
    }
  }

  test("components are orthonormal") {
    for (a <- 1 to 3; b <- a to 3) {
      val dot = (0 until 4).map(i => pcs((a, i)) * pcs((b, i))).sum
      val expected = if (a == b) 1.0 else 0.0
      // cross terms carry the (λ_next/λ)^iters = 4^-12 ≈ 6e-8 power-
      // iteration residual per component — orthogonal to 1e-6, not ulp
      assert(math.abs(dot - expected) < 1e-6, s"v$a . v$b = $dot")
    }
  }

  test("pc1 equals topComponent") {
    val top = operators.Pca
      .topComponent(spark, emb, "embedding", iters = 12)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (i <- 0 until 4)
      assert(pcs((1, i)) === top(i), s"component $i")
  }

  test("sign convention: largest-|loading| component is positive per pc") {
    for (pc <- 1 to 3) {
      val loadings = (0 until 4).map(i => pcs((pc, i)))
      val anchor = loadings.maxBy(math.abs)
      assert(anchor > 0, s"pc$pc anchor loading $anchor")
    }
  }
}
