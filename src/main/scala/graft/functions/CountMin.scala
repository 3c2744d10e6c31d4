package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch as a mergeable typed `Aggregator` — the
  * point-frequency member of the engine's sketch family (distinct = [[Hll]],
  * heavy hitters = [[MisraGries]], quantiles = [[QuantileSketch]]).
  *
  * `d` universal-hash rows × `w` counters; an occurrence of `key` increments
  * one cell per row, an estimate reads the MIN of its `d` cells — always ≥
  * the true count, and over by more than εN (ε = e/w) with probability ≤
  * e^-d. Unlike Misra-Gries the state never evicts, so merge is plain
  * element-wise addition: partial sketches combine map-side like any
  * built-in aggregate, and the shuffled state is a FIXED `d·w` longs per
  * group regardless of key cardinality — the whole point at 100 TB, where
  * the exact per-key count behind one hot aggregation column would shuffle
  * the full key universe.
  *
  * Every hash is md5-derived exactly like the MinHash family
  * ([[graft.operators.Dedup.uhA]]/`uhB` universal hashes over the 32-bit
  * md5-prefix base hash), so a DuckDB oracle replays the sketch CELL FOR
  * CELL: the declared query's estimates hash-match SQL that rebuilds the
  * same cells from exact group counts (sum of colliding keys' counts ==
  * the cell's increment total, addition being commutative).
  */
final class CountMin(d: Int, w: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  require(d >= 1 && d <= 8, "d must be in [1, 8]")
  require(w >= 16, "w must be >= 16")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], key: String): Array[Long] = {
    val base = CountMin.base32(key)
    var i = 0
    while (i < d) {
      b(i * w + CountMin.cell(base, i, w)) += 1L
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMin {

  private val P = 2147483647L // 2^31 - 1, the MinHash family's prime

  /** First 4 bytes of md5 as an unsigned 32-bit value — identical to
    * [[graft.operators.Dedup]]'s base hash and to
    * `('0x' || substring(md5(x), 1, 8))::BIGINT` in DuckDB.
    */
  private[graft] def base32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s.getBytes("UTF-8"))
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** Row-`i` cell for a base hash: ((a_i·h + b_i) mod p) mod w. */
  private[graft] def cell(base: Long, i: Int, w: Int): Int =
    (((graft.operators.Dedup.uhA(i) * base +
      graft.operators.Dedup.uhB(i)) % P) % w).toInt

  /** Column form of the row-`i` cell over a string key — bit-identical to
    * the JVM path (same md5 prefix, same universal hash) so a sketch built
    * by the Aggregator can be PROBED with pure Column arithmetic.
    */
  def cellCol(key: Column, i: Int, w: Int): Column =
    ((lit(graft.operators.Dedup.uhA(i)) *
      conv(substring(md5(key), 1, 8), 16, 10).cast("long") +
      lit(graft.operators.Dedup.uhB(i))) % lit(P)) % lit(w)

  /** Point-frequency estimate from a collected sketch (a `d·w` literal —
    * bounded, independent of data size): MIN over the key's `d` cells.
    */
  def estimateCol(sketch: Seq[Long], d: Int, w: Int, key: Column): Column = {
    require(sketch.length == d * w)
    val flat = typedLit(sketch)
    (0 until d).map { i =>
      element_at(flat, (lit(i * w) + cellCol(key, i, w) + lit(1)).cast("int"))
    }.reduce(least(_, _))
  }

  /** DuckDB replay of [[cellCol]] for oracle SQL. */
  def cellSql(keySql: String, i: Int, w: Int): String =
    s"((((('0x' || substring(md5($keySql), 1, 8))::BIGINT) * " +
      s"${graft.operators.Dedup.uhA(i)} + ${graft.operators.Dedup.uhB(i)}) " +
      s"% $P) % $w)"
}
