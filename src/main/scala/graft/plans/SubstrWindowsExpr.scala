package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native ExactSubstr window keys — tokenize + every `w`-token window's
  * 128-bit rolling key as ONE codegen-resident expression:
  * `array<struct<pos:int, h1:bigint, h2:bigint>>`, null when the doc has
  * fewer than `w` tokens (callers posexplode, which drops those docs like
  * the old empty-array guard).
  *
  * Replaces the higher-order `transform(sequence)(slice)` +
  * `xxhash64(array)` chain in `Dedup.windowOccurrences`: higher-order
  * functions are CodegenFallback (interpreted, one GenericArrayData per
  * window), and profiling at sf0.1 put that chain at ~14 µs/window —
  * ~140 core-seconds for a 0.6 MB corpus, the family's dominant CPU (the
  * ShinglesExpr recipe, applied to the span family). Optimization-guide
  * step 4: eliminate non-codegen expressions in the hot path.
  *
  * Cost model: the old chain hashed w tokens per window — O(w·n) byte
  * hashing per doc plus per-window array allocs. This expression hashes
  * each token ONCE per lane (XXH64 over the token's UTF-8 bytes, two
  * seeds) and rolls a degree-(w−1) polynomial over the token hashes in
  * 2⁶⁴ arithmetic — O(n) work per doc, ZERO allocation per window beyond
  * the output row. At the paper's production w=50 that deletes ~50× of
  * the family's dominant CPU, independent of corpus size.
  *
  * Tokenization is byte-level whitespace scanning over the UTF8String —
  * exactly `split("\\s+")` minus empties: Java's `\s` is the six ASCII
  * whitespace bytes, and no UTF-8 continuation/lead byte is ASCII, so
  * byte scanning reproduces the regex split's token boundaries (and
  * positions, which DO reach query output) without materializing a
  * String or token array.
  *
  * Key contract (same as the r14 2×xxhash64 struct it replaces): the key
  * never reaches query output — it exists to be counted and semi-joined,
  * and the oracle flags duplicates with its own md5 chain, comparing flag
  * SETS. Two independent 64-bit lanes (different token seeds AND odd
  * multipliers) put distinct-window collisions at the ~2⁻¹²⁸ birthday
  * bound; a collision over-reports a span — the safe direction for
  * dedup. Keys differ from the r14 family, so a PERSISTED window-count
  * index written before this round must be rebuilt before screening new
  * batches against it (the CLI's nightly-build verb does exactly that;
  * OPTIMIZATION_r15.md records the bump).
  */
case class SubstrWindowsExpr(child: Expression, w: Int)
    extends UnaryExpression {

  require(w >= 2, "windowTokens must be >= 2")

  override def prettyName: String = "graft_substr_windows"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h1", LongType, nullable = false),
      StructField("h2", LongType, nullable = false))),
    containsNull = false)

  /** Null on null input AND on short docs (< w tokens). */
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    SubstrWindowsExpr.compute(t.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.plans.SubstrWindowsExpr.compute($c, $w);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SubstrWindowsExpr =
    copy(child = newChild)
}

object SubstrWindowsExpr {

  /** Odd multipliers (invertible mod 2⁶⁴) and token-hash seeds of the two
    * lanes — fixed so build and screen of a persisted index agree.
    */
  private val M1 = 0x9E3779B97F4A7C15L
  private val M2 = 0xC2B2AE3D27D4EB4FL
  private val S1 = 0L
  private val S2 = 1L

  /** All w-token windows of one doc as (pos, h1, h2) rows; null when the
    * doc has fewer than w tokens. One XXH64 per token per lane + an O(1)
    * rolling update per window.
    */
  def compute(text: UTF8String, w: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // pass 1: token byte ranges → per-token hashes (two seeded lanes).
    // java \s == the six ASCII whitespace bytes; UTF-8 multi-byte chars
    // never match, so the byte scan equals split("\\s+") minus empties.
    var t1 = new Array[Long](math.max(16, len / 6))
    var t2 = new Array[Long](t1.length)
    var n = 0
    var i = 0
    while (i < len) {
      var b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      while (i < len && isWs(b)) {
        i += 1
        if (i < len) b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      }
      if (i < len) {
        val start = i
        while (i < len && !isWs(org.apache.spark.unsafe.Platform.getByte(base, off + i))) i += 1
        if (n == t1.length) {
          t1 = java.util.Arrays.copyOf(t1, n * 2)
          t2 = java.util.Arrays.copyOf(t2, n * 2)
        }
        t1(n) = XXH64.hashUnsafeBytes(base, off + start, i - start, S1)
        t2(n) = XXH64.hashUnsafeBytes(base, off + start, i - start, S2)
        n += 1
      }
    }
    if (n < w) return null
    // pass 2: rolling polynomial per lane — H(i) = Σ t(i+j)·M^(w−1−j).
    var mw1 = 1L; var mw2 = 1L // M^(w−1)
    var j = 1
    while (j < w) { mw1 *= M1; mw2 *= M2; j += 1 }
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < w) { h1 = h1 * M1 + t1(j); h2 = h2 * M2 + t2(j); j += 1 }
    val out = new Array[Any](n - w + 1)
    out(0) = new GenericInternalRow(Array[Any](0, h1, h2))
    var p = 1
    while (p <= n - w) {
      h1 = (h1 - t1(p - 1) * mw1) * M1 + t1(p + w - 1)
      h2 = (h2 - t2(p - 1) * mw2) * M2 + t2(p + w - 1)
      out(p) = new GenericInternalRow(Array[Any](p, h1, h2))
      p += 1
    }
    new GenericArrayData(out)
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'
}
