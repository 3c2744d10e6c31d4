package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 2-D Hilbert curve index — the locality-tighter alternative to Z-order
  * bit interleaving for clustered layouts (cf. reference engines'
  * OPTIMIZE ... ZORDER and Databricks-style liquid clustering): every
  * consecutive pair of curve positions is a GRID NEIGHBOR (unit step), so
  * a rectangular probe touches fewer, longer runs of the curve than under
  * Z-order, whose quadrant seams produce long jumps. Same skipping
  * machinery, tighter chunks.
  *
  * The xy2d walk (Wikipedia's canonical iterative form) unrolls at plan
  * build time into pure integer Column expressions — `bits` levels of
  * AND/XOR/flip/swap — so the whole index codegens into the scan
  * projection; nothing here is a UDF. Inputs are BIN indices in
  * [0, 2^bits): the caller quantile-bins raw columns first (exactly like
  * the z-path), which is what makes skew unable to starve the curve.
  */
object HilbertCurve {

  def hilbertIndex2(xBin: Column, yBin: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 15, "bits must be in [1, 15]")
    var x = xBin
    var y = yBin
    var d: Column = lit(0)
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = when(x.bitwiseAND(lit(s)) > 0, 1).otherwise(0)
      val ry = when(y.bitwiseAND(lit(s)) > 0, 1).otherwise(0)
      d = d + lit(s * s) * (lit(3) * rx).bitwiseXOR(ry)
      // rotate the quadrant: flip when rx==1, then swap axes (ry==0 arm)
      val fx = when(rx === 1, lit(s - 1) - x).otherwise(x)
      val fy = when(rx === 1, lit(s - 1) - y).otherwise(y)
      val nx = when(ry === 0, fy).otherwise(x)
      val ny = when(ry === 0, fx).otherwise(y)
      x = nx
      y = ny
      s >>= 1
    }
    d
  }

  /** Plain-Scala reference of the same walk — the spec's ground truth for
    * gating the expression tree bit-for-bit over every grid cell.
    */
  def reference(x0: Int, y0: Int, bits: Int): Int = {
    var x = x0; var y = y0; var d = 0
    var s = 1 << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
