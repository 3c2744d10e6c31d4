package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic HyperLogLog as a mergeable typed `Aggregator` — approx
  * COUNT DISTINCT whose every bit is ORACLE-REPLAYABLE, unlike the built-in
  * `approx_count_distinct` (xxHash64 seed + HLL++ bias tables make its
  * estimate engine-private; `rel_approx_distinct` is rows-only for exactly
  * that reason).
  *
  * m = 64 registers (p = 6) over the MinHash family's 60-bit md5-prefix
  * hash: register index = low 6 bits, rho = leading-zero run of the
  * remaining 54-bit suffix + 1 (an empty suffix counts 55). Merge is
  * element-wise MAX — associative and idempotent, so partial sketches
  * combine map-side and the shuffled state is 64 ints per group no matter
  * how many distinct keys flow through: the 100 TB story vs an exact
  * count(DISTINCT) whose state is the key universe.
  *
  * The estimate avoids float-summation order entirely: Σ 2^-Mj is kept as
  * the exact integer S = Σ 2^(55-Mj) (≤ 64·2^55 < 2^63), and
  * E = α·m²·2^55 / S is ONE double division — bit-identical in any
  * summation order and in DuckDB. Small-range correction: linear counting
  * m·ln(m/V) when E ≤ 2.5m and V (empty registers) > 0, per the original
  * Flajolet formula.
  */
final class Hll extends Aggregator[String, Array[Int], Double] {

  override def zero: Array[Int] = new Array[Int](Hll.M)

  override def reduce(b: Array[Int], key: String): Array[Int] = {
    val h = Hll.hash60(key)
    val idx = (h & (Hll.M - 1)).toInt
    val rho = Hll.rho(h >>> Hll.P)
    if (rho > b(idx)) b(idx) = rho
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < Hll.M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(r: Array[Int]): Double = Hll.estimate(r)

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Hll {

  val P = 6
  val M = 64          // 2^P registers
  val W = 60 - P      // 54-bit rho suffix
  val MaxRho: Int = W + 1

  /** α_64 — spelled as the same arithmetic in the oracle SQL so both
    * engines land the identical IEEE double.
    */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / 64.0)
  val AlphaSql: String = "(0.7213 / (1 + 1.079 / 64.0))"

  /** First 15 hex chars of md5 as a 60-bit value — [[graft.operators.Dedup]]'s
    * token-hash convention; `('0x' || substring(md5(x), 1, 15))::BIGINT`
    * in DuckDB.
    */
  private[graft] def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s.getBytes("UTF-8"))
    // first 8 bytes as unsigned 64-bit, keep the top 15 hex digits = 60 bits
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Leading-zero run of the 54-bit suffix, + 1; 55 for an all-zero suffix.
    * Equivalently `W + 1 - bitlength(w)`.
    */
  private[graft] def rho(w: Long): Int =
    MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))

  /** Raw-or-linear-counting estimate from the 64 registers via the exact
    * integer harmonic sum (see class doc).
    */
  private[graft] def estimate(reg: Array[Int]): Double = {
    var s = 0L
    var v = 0
    var i = 0
    while (i < M) {
      s += 1L << (MaxRho - reg(i))
      if (reg(i) == 0) v += 1
      i += 1
    }
    val raw = Alpha * M * M * math.pow(2.0, MaxRho) / s.toDouble
    if (raw <= 2.5 * M && v > 0) M * math.log(M.toDouble / v) else raw
  }

  /** DuckDB replay: per-key register index + rho from the same 60-bit hash.
    * `bitlength(w)` is exact integer log2 via a CASE cascade — no float
    * log2 at any width, so rho can never round differently from the JVM.
    */
  def rhoSql(keySql: String): String = {
    val h = s"(('0x' || substring(md5($keySql), 1, 15))::BIGINT)"
    val w = s"($h >> $P)"
    val cascade = (1 to W).reverse
      .map(bl => s"WHEN $w >= ${1L << (bl - 1)} THEN ${MaxRho - bl}")
      .mkString(" ")
    s"(CASE $cascade ELSE $MaxRho END)"
  }

  def idxSql(keySql: String): String =
    s"((('0x' || substring(md5($keySql), 1, 15))::BIGINT) % $M)"

  /** Estimate over a registers CTE `(grp, idx, mj)` — the exact-integer
    * harmonic sum plus the same linear-counting branch as [[estimate]].
    * Registers with no key hashing to them contribute mj = 0 (2^55) and
    * count toward V, exactly as the JVM's zero-initialized array does.
    */
  def estimateSql(regCte: String, grpCol: String): String =
    s"""hsum AS (
       |  SELECT $grpCol,
       |         sum(CAST(1 AS BIGINT) << ($MaxRho - mj)) AS s,
       |         CAST($M - count(*) FILTER (WHERE mj > 0) AS BIGINT) AS v
       |  FROM $regCte GROUP BY 1),
       |est AS (
       |  SELECT $grpCol,
       |         CASE WHEN ($AlphaSql * $M * $M * (2.0 ** $MaxRho)
       |                    / CAST(s AS DOUBLE)) <= 2.5 * $M AND v > 0
       |              THEN $M * ln($M / CAST(v AS DOUBLE))
       |              ELSE $AlphaSql * $M * $M * (2.0 ** $MaxRho)
       |                   / CAST(s AS DOUBLE) END AS n_est
       |  FROM hsum)""".stripMargin
}
