package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top principal component of an embedding column by power iteration —
  * the whitening/compression primitive an embedding pipeline runs before
  * IVF-PQ-style indexing.
  *
  * Scale split: the Gram matrix G = Σ x xᵀ is the ONLY data-sized pass,
  * computed declaratively as a double-explode + hash aggregate — the n·d²
  * product tuples collapse map-side to ≤ d² partial sums per partition
  * before the exchange, so the shuffle carries d² rows no matter how big
  * the corpus is. The iteration itself is d×d (driver-side, bounded
  * metadata scale — exactly how distributed ML systems treat small-d
  * covariance). The result is a deterministic function of G: any engine
  * replaying the same explode/sum + matvec chain lands the same vector
  * to fp-noise, which a 6 dp round absorbs.
  *
  * Sign is fixed by the first component of non-trivial magnitude
  * (eigenvectors are sign-ambiguous; replays must agree).
  */
object Pca {

  /** Gram matrix entries (i, j, g) for `vecCol: array<float>`. */
  def gram(emb: DataFrame, vecCol: String): DataFrame = {
    val ex = emb.select(col(vecCol).as("__v"))
      .select(posexplode(col("__v")).as(Seq("i", "xi")), col("__v"))
      .select(col("i"), col("xi").cast("double").as("xi"),
        posexplode(col("__v")).as(Seq("j", "xj")))
    ex.groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj").cast("double")).as("g"))
  }

  /** (component index, loading) of the dominant eigenvector after exactly
    * `iters` power iterations from the uniform start — 64 rows for d=64.
    */
  def topComponent(spark: SparkSession, emb: DataFrame, vecCol: String,
                   iters: Int = 12): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val entries = gram(emb, vecCol).collect() // bounded: d² rows
    val d = entries.map(_.getInt(0)).max + 1
    val g = Array.ofDim[Double](d, d)
    entries.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val next = Array.tabulate(d)(i =>
        (0 until d).map(j => g(i)(j) * v(j)).sum)
      val norm = math.sqrt(next.map(x => x * x).sum)
      v = next.map(_ / norm)
    }
    val k0 = v.indexWhere(x => math.abs(x) > 1e-9)
    val sign = if (k0 >= 0 && v(k0) < 0) -1.0 else 1.0
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i, x * sign) }.toSeq
      .toDF("component_idx", "loading")
  }

  /** Top-k principal components by power iteration WITH DEFLATION: after
    * each component converges, G ← G − λ v vᵀ (λ = vᵀGv) and the next
    * component is extracted from the deflated matrix. Work split is
    * unchanged from [[topComponent]]: ONE data-sized Gram pass, then
    * d×d×k·iters driver-side arithmetic (d=64, k≤8 → trivial metadata
    * scale).
    *
    * Sign convention differs from [[topComponent]] on purpose: the sign
    * is anchored at the LARGEST-|loading| index (ties → lowest index),
    * not the first index above 1e-9. Deflated components have near-zero
    * residuals (~1e-7) in directions already extracted; a
    * first-above-threshold rule would anchor the sign on such a
    * residual, whose sign is pure fp-cancellation noise the two engines
    * may disagree on — flipping the whole component. The max-|loading|
    * anchor is ≥ 1/√d and stable. Deflation uses the un-sign-fixed vector — v vᵀ is
    * sign-invariant — and each component's sign is fixed independently
    * for output. Both engines replay the same finite op chain, so parity
    * needs determinism, not convergence; round6 absorbs fp-order noise.
    *
    * Output: (pc 1-based, component_idx, loading).
    */
  def topKComponents(spark: SparkSession, emb: DataFrame, vecCol: String,
                     k: Int, iters: Int = 12): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(iters >= 1, "iters must be >= 1")
    val entries = gram(emb, vecCol).collect() // bounded: d² rows
    val d = entries.map(_.getInt(0)).max + 1
    val g = Array.ofDim[Double](d, d)
    entries.foreach(r => g(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    val out = Seq.newBuilder[(Int, Int, Double)]
    for (c <- 1 to k) {
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 1 to iters) {
        val next = Array.tabulate(d)(i =>
          (0 until d).map(j => g(i)(j) * v(j)).sum)
        val norm = math.sqrt(next.map(x => x * x).sum)
        v = next.map(_ / norm)
      }
      val mx = v.map(math.abs).max
      val k0 = v.indexWhere(x => math.abs(x) == mx)
      val sign = if (v(k0) < 0) -1.0 else 1.0
      v.zipWithIndex.foreach { case (x, i) => out += ((c, i, x * sign)) }
      val lambda = (0 until d).map(i =>
        (0 until d).map(j => v(i) * g(i)(j) * v(j)).sum).sum
      for (i <- 0 until d; j <- 0 until d) g(i)(j) -= lambda * v(i) * v(j)
    }
    import spark.implicits._
    out.result().toDF("pc", "component_idx", "loading")
  }

  /** DuckDB replay of [[topComponent]] — the same Gram + unrolled matvec
    * chain, generated so the iteration count can never drift between the
    * engines.
    */
  def oracleSql(table: String, vecCol: String, dim: Int, iters: Int): String = {
    // AS MATERIALIZED everywhere: DuckDB inlines CTEs by default, and an
    // iteration chain of inlined CTEs re-evaluates its tail per reference
    // — exponential work (and file opens) by v12
    val base =
      s"""ex AS MATERIALIZED (SELECT vec_id, unnest(range(0, $dim)) AS i,
         |             unnest($vecCol) AS x FROM $table),
         |g AS MATERIALIZED (
         |      SELECT a.i AS i, b.i AS j, sum(CAST(a.x AS DOUBLE) * b.x) AS g
         |      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
         |v0 AS MATERIALIZED (SELECT unnest(range(0, $dim)) AS i,
         |              1.0 / sqrt(CAST($dim AS DOUBLE)) AS x)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""s$t AS MATERIALIZED (SELECT g.i AS i, sum(g.g * v${t - 1}.x) AS x0
         |        FROM g JOIN v${t - 1} ON g.j = v${t - 1}.i GROUP BY 1),
         |n$t AS MATERIALIZED (SELECT sqrt(sum(x0 * x0)) AS nn FROM s$t),
         |v$t AS MATERIALIZED (SELECT i, x0 / nn AS x FROM s$t CROSS JOIN n$t)""".stripMargin
    }
    s"""WITH $base,
       |${steps.mkString(",\n")},
       |sgn AS (SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS s
       |        FROM v$iters
       |        WHERE i = (SELECT min(i) FROM v$iters WHERE abs(x) > 1e-9))
       |SELECT CAST(i AS INT) AS component_idx, round(x * sgn.s, 6) AS loading
       |FROM v$iters CROSS JOIN sgn""".stripMargin
  }

  /** DuckDB replay of [[topKComponents]] — the per-component iterate /
    * λ / deflate chain unrolled as materialized CTEs (DuckDB inlines CTEs
    * by default; an inlined iteration tail re-evaluates exponentially).
    * ≤ k·(3·iters+3) CTEs of ≤ d² rows each — trivial for d=64.
    */
  def oracleKSql(table: String, vecCol: String, dim: Int, k: Int,
                 iters: Int): String = {
    val base =
      s"""ex AS MATERIALIZED (SELECT vec_id, unnest(range(0, $dim)) AS i,
         |             unnest($vecCol) AS x FROM $table),
         |g1 AS MATERIALIZED (
         |      SELECT a.i AS i, b.i AS j, sum(CAST(a.x AS DOUBLE) * b.x) AS g
         |      FROM ex a JOIN ex b USING (vec_id) GROUP BY 1, 2),
         |v0 AS MATERIALIZED (SELECT unnest(range(0, $dim)) AS i,
         |              1.0 / sqrt(CAST($dim AS DOUBLE)) AS x)""".stripMargin
    val comps = (1 to k).map { c =>
      val steps = (1 to iters).map { t =>
        val prev = if (t == 1) "v0" else s"v${c}_${t - 1}"
        s"""s${c}_$t AS MATERIALIZED (SELECT g.i AS i, sum(g.g * $prev.x) AS x0
           |        FROM g$c g JOIN $prev ON g.j = $prev.i GROUP BY 1),
           |n${c}_$t AS MATERIALIZED (SELECT sqrt(sum(x0 * x0)) AS nn FROM s${c}_$t),
           |v${c}_$t AS MATERIALIZED (SELECT i, x0 / nn AS x
           |        FROM s${c}_$t CROSS JOIN n${c}_$t)""".stripMargin
      }
      val vf = s"v${c}_$iters"
      val deflate = if (c < k)
        s""",
           |l$c AS MATERIALIZED (SELECT sum(vi.x * g.g * vj.x) AS lam
           |       FROM g$c g JOIN $vf vi ON g.i = vi.i
           |                  JOIN $vf vj ON g.j = vj.i),
           |g${c + 1} AS MATERIALIZED (
           |       SELECT g.i AS i, g.j AS j, g.g - l$c.lam * vi.x * vj.x AS g
           |       FROM g$c g JOIN $vf vi ON g.i = vi.i
           |                  JOIN $vf vj ON g.j = vj.i CROSS JOIN l$c)""".stripMargin
      else ""
      s"""${steps.mkString(",\n")},
         |sgn$c AS (SELECT CASE WHEN x < 0 THEN -1.0 ELSE 1.0 END AS s
         |        FROM $vf
         |        WHERE i = (SELECT min(i) FROM $vf
         |                   WHERE abs(x) = (SELECT max(abs(x)) FROM $vf)))$deflate""".stripMargin
    }
    val sel = (1 to k).map { c =>
      s"""SELECT CAST($c AS INT) AS pc, CAST(i AS INT) AS component_idx,
         |       round(x * sgn$c.s, 6) AS loading
         |FROM v${c}_$iters CROSS JOIN sgn$c""".stripMargin
    }
    s"""WITH $base,
       |${comps.mkString(",\n")}
       |${sel.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
