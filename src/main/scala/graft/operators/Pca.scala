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
}
