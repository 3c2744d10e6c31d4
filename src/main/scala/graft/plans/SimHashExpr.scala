package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst SimHash over a token array — the whole signature (tf
  * weighting, 60-bit md5 token hashes, bit votes, sign collapse) as ONE
  * codegen-resident expression.
  *
  * Replaces the two earlier forms in the hot path: the higher-order-function
  * build ([[graft.operators.Dedup.simhash]]) pays `bits` interpreted filter
  * passes per row, and the mapPartitions twin
  * ([[graft.operators.Dedup.simhashFast]]) breaks whole-stage codegen at
  * both edges (row → tuple → row). This stays inside the generated stage:
  * the tokenize split feeds it columnar, one md5 + one bit loop per distinct
  * token. Values are pinned byte-equal to both twins in DedupSpec and to
  * the DuckDB oracle's hex-cast replay (dedup_simhash/_weighted).
  *
  * Semantics (identical to the twins): null array → null; null elements
  * ignored; `weighted` votes ±tf per distinct token, otherwise ±1; bit j of
  * the result is set iff its vote sum is strictly positive. Vote sums are
  * integer and commutative, so element order never matters.
  */
case class SimHashExpr(child: Expression, bits: Int, weighted: Boolean)
    extends UnaryExpression {

  require(bits >= 1 && bits <= 60, "bits must be in [1, 60]")

  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    SimHashExpr.compute(a.asInstanceOf[ArrayData], bits, weighted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashExpr.compute($c, $bits, $weighted);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** 60-bit token hash: first 8 md5 bytes as an unsigned big-endian long
    * shifted right 4 — equal to the oracle's `('0x' || substring(md5(t),
    * 1, 15))::BIGINT` and to the twins' helper.
    */
  private def md5Prefix60(md: java.security.MessageDigest,
                          bytes: Array[Byte]): Long = {
    val h = md.digest(bytes)
    var v = 0L
    var j = 0
    while (j < 8) { v = (v << 8) | (h(j) & 0xffL); j += 1 }
    v >>> 4
  }

  /** Called from generated code — one tf map + one md5/bit loop per row.
    * The UTF8String keys are views into the input buffer, which is stable
    * for the duration of the call; nothing escapes it.
    */
  def compute(arr: ArrayData, bits: Int, weighted: Boolean): Long = {
    val md = mdLocal.get()
    val tf = new java.util.HashMap[UTF8String, Integer]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i))
        tf.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
      i += 1
    }
    val votes = new Array[Int](bits)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val w = if (weighted) e.getValue.intValue() else 1
      val h = md5Prefix60(md, e.getKey.getBytes)
      var j = 0
      while (j < bits) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) w else -w)
        j += 1
      }
    }
    var sim = 0L
    var j = 0
    while (j < bits) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }
}
