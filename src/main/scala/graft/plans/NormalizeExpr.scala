package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen-resident native
  * expression — the canonicalization step a text corpus needs BEFORE any
  * fingerprint/shingle/dedup pass: "é" as U+00E9 and as "e"+U+0301 are the
  * same text to a reader but different bytes to md5/MinHash/SimHash, so an
  * unnormalized corpus under-deduplicates (byte-distinct duplicates) and
  * splits token statistics across spellings.
  *
  * Spark has no built-in for this (`lower`/`translate` don't touch
  * combining sequences), and a Scala UDF would break whole-stage codegen in
  * the hottest path of the cleaning pipeline — so this follows the engine's
  * sanctioned extension order (SURVEY.md §2.11): a native Catalyst
  * `UnaryExpression` with `doGenCode`, like [[SimHashExpr]].
  *
  * Scale shape: purely per-row, no state, stays inside the generated stage.
  * The dominant cost at 100 TB is the UTF-16 roundtrip
  * (UTF8String → java.lang.String → Normalizer), so already-normalized
  * input — in practice almost all of a real corpus — short-circuits on
  * `Normalizer.isNormalized` (one forward scan, zero allocation for ASCII)
  * and returns the input buffer untouched.
  *
  * Semantics: null → null; the form argument is a case-insensitive literal
  * (it parameterizes codegen, it is not data). Output equals
  * `java.text.Normalizer.normalize(s, form)` exactly, which is what
  * DuckDB's `nfc_normalize` implements for NFC — the `text_normalize`
  * oracle pins the cross-engine agreement on injected combining sequences.
  */
case class NormalizeExpr(child: Expression, form: String)
    extends UnaryExpression {

  NormalizeExpr.formOf(form) // fail fast at construction on a bad form name

  override def prettyName: String = "graft_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    NormalizeExpr.compute(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.NormalizeExpr.compute($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): NormalizeExpr =
    copy(child = newChild)
}

object NormalizeExpr {

  private[plans] def formOf(name: String): java.text.Normalizer.Form =
    name.toUpperCase(java.util.Locale.ROOT) match {
      case "NFC"  => java.text.Normalizer.Form.NFC
      case "NFD"  => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unknown normalization form '$other' (want NFC|NFD|NFKC|NFKD)")
    }

  /** Called from generated code. Already-normalized input returns the
    * original UTF8String — no decode, no allocation beyond the UTF-16 view
    * `isNormalized` walks (and for ASCII that walk is one pass, no copy).
    */
  def compute(s: UTF8String, form: String): UTF8String = {
    val f = formOf(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
