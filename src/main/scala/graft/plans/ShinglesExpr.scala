package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst shingling — whitespace tokenize + distinct word
  * n-grams (and optionally their 32-bit md5 base hashes) as ONE
  * codegen-resident expression.
  *
  * Replaces the typed `mapPartitions` in
  * [[graft.operators.Dedup.shingleSets]]/`shingleSetsHashed`, which broke
  * whole-stage codegen at both edges (row → tuple → row) on BOTH sides of
  * every dedup self-join — the last stage-break in the dedup hot path
  * (the SimHashExpr recipe, applied to shingling). The higher-order
  * expression chain ([[graft.functions.TextFunctions.shingles]]) remains
  * the semantics-documentation twin; profiling showed its interpreted
  * sequence/slice/array_join/array_distinct chain at ~1.2 ms/doc vs ~µs
  * for this compute.
  *
  * Semantics (byte-identical to both twins, pinned in DedupSpec):
  * tokens = `String.split("\\s+")` minus empties (Java split backs
  * Spark's `split`); fewer than `n` tokens → NULL (callers filter, which
  * is the mapPartitions form's row drop); shingles are space-joined
  * n-grams, `.distinct` keeping first occurrence like `array_distinct`;
  * hashes are the first 4 md5 bytes as an unsigned 32-bit value — equal
  * to the oracle's `('0x' || substring(md5(s), 1, 8))::BIGINT`.
  */
case class ShinglesExpr(child: Expression, n: Int, withHashes: Boolean)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType =
    if (withHashes)
      StructType(Seq(
        StructField("sh", ArrayType(StringType, containsNull = false)),
        StructField("hs", ArrayType(LongType, containsNull = false))))
    else ArrayType(StringType, containsNull = false)

  /** Null on null input AND on short docs (< n tokens). */
  override def nullable: Boolean = true

  override def nullSafeEval(t: Any): Any =
    if (withHashes) ShinglesExpr.computeHashed(t.asInstanceOf[UTF8String], n)
    else ShinglesExpr.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val fn = if (withHashes) "computeHashed" else "compute"
      s"""${ev.value} = graft.plans.ShinglesExpr.$fn($c, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {

  private val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** Distinct n-gram shingle strings of one doc; null when < n tokens.
    * Same scala pipeline as the retired mapPartitions form, so outputs
    * are byte-identical by construction.
    */
  private def shinglesOf(text: UTF8String, n: Int): Array[String] = {
    val toks = text.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) null
    else toks.sliding(n).map(_.mkString(" ")).toArray.distinct
  }

  def compute(text: UTF8String, n: Int): ArrayData = {
    val sh = shinglesOf(text, n)
    if (sh == null) null
    else new GenericArrayData(sh.map(s => UTF8String.fromString(s): Any))
  }

  def computeHashed(text: UTF8String, n: Int): InternalRow = {
    val sh = shinglesOf(text, n)
    if (sh == null) return null
    val md = mdLocal.get()
    val hs = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) {
      val h = md.digest(sh(i).getBytes("UTF-8"))
      hs(i) = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      i += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(sh.map(s => UTF8String.fromString(s): Any)),
      new GenericArrayData(hs)))
  }
}
