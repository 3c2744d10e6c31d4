package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Vector math over `array<float>` embedding columns as pure higher-order
  * Column expressions: float lanes are widened to double, then accumulated
  * left-to-right — the same operation order DuckDB's list_dot_product uses,
  * so oracle comparisons agree to the last ulp (and are rounded to 6 decimals
  * at the boundary regardless).
  *
  * For 100 TB scale these stay expression-only (no shuffle, no UDF); if the
  * dot product ever dominates a profile, the promotion path is a codegen'd
  * Catalyst Expression over the raw float arrays (SURVEY.md §7.3).
  */
object VectorFunctions {

  /** Elementwise-product sum of two numeric arrays, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity d(a,b) / (|a|·|b|); null if either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  /** Signed-projection bit for one LSH hyperplane given ±1 coefficients. */
  def planeBit(v: Column, coefs: Seq[Double]): Column =
    (dot(v, typedLit(coefs)) > 0).cast("long")

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `nPlanes` bits
    * packed into a long. Hyperplane coefficients are deterministic ±1 values
    * derived from md5, generated once on the driver and folded into the plan
    * as literals — identical constants are embedded in the oracle SQL.
    */
  def lshSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (coefs, p) =>
      when(dot(v, typedLit(coefs)) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic ±1 hyperplane coefficients: parity of the first hex char
    * of md5("p:j").
    */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val h = md.digest(s"$p:$j".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1.0 else -1.0
      }
    }
  }
}
