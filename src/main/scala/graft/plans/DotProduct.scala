package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays (float or double
  * elements), with whole-stage codegen.
  *
  * Replaces `aggregate(zip_with(a, b, *), 0.0, +)` in similarity hot paths:
  * higher-order functions are interpreted per-lambda-call, this compiles to
  * a tight Java loop. Semantics are identical to the fold (and to DuckDB's
  * `list_dot_product`): left-to-right double accumulation; null result on
  * length mismatch or any null element.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_dot"

  private def okElem(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if okElem(lt) && okElem(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the engine's native functions — both as an
  * imperative helper (works on any existing session) and via
  * [[GraftExtensions]] for `spark.sql.extensions`-style wiring.
  */
object GraftFunctions {
  val dotName = "graft_dot"
  val cosName = "graft_cos"
  val simhashName = "graft_simhash"
  val normalizeName = "graft_normalize"
  val shinglesName = "graft_shingles"
  val substrWindowsName = "graft_substr_windows"

  /** `graft_normalize(text, form)` — form must be a literal (it
    * parameterizes the generated code, it is not data).
    */
  private[plans] def normalizeBuilder(exprs: Seq[Expression]): NormalizeExpr = {
    require(exprs.length == 2, s"$normalizeName expects (text, form)")
    require(exprs(1).foldable, s"$normalizeName form must be a literal")
    NormalizeExpr(exprs(0), exprs(1).eval(null).toString)
  }

  /** `graft_simhash(tokens, bits, weighted)` — the trailing args must be
    * literals (they parameterize the generated code, they are not data).
    */
  private[plans] def simhashBuilder(exprs: Seq[Expression]): SimHashExpr = {
    require(exprs.length == 3,
      s"$simhashName expects (tokens, bits, weighted)")
    require(exprs(1).foldable && exprs(2).foldable,
      s"$simhashName bits/weighted must be literals")
    SimHashExpr(exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue(),
      exprs(2).eval(null).asInstanceOf[Boolean])
  }

  /** `graft_shingles(text, n, withHashes)` — the trailing args must be
    * literals (they parameterize the generated code, they are not data).
    */
  private[plans] def shinglesBuilder(exprs: Seq[Expression]): ShinglesExpr = {
    require(exprs.length == 3,
      s"$shinglesName expects (text, n, withHashes)")
    require(exprs(1).foldable && exprs(2).foldable,
      s"$shinglesName n/withHashes must be literals")
    ShinglesExpr(exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue(),
      exprs(2).eval(null).asInstanceOf[Boolean])
  }

  /** `graft_substr_windows(text, w)` — w must be a literal (it
    * parameterizes the rolling-window computation, it is not data).
    */
  private[plans] def substrWindowsBuilder(exprs: Seq[Expression]): SubstrWindowsExpr = {
    require(exprs.length == 2, s"$substrWindowsName expects (text, w)")
    require(exprs(1).foldable, s"$substrWindowsName w must be a literal")
    SubstrWindowsExpr(exprs(0),
      exprs(1).eval(null).asInstanceOf[Number].intValue())
  }

  /** Register once per session: every re-registration makes
    * SimpleFunctionRegistry log a replaced-function warning, and call
    * sites invoke this defensively per query — without the guard a bench
    * run floods its tail with hundreds of identical warnings.
    */
  def register(spark: SparkSession): Unit = {
    // guarded on the NEWEST name so a session that pre-registered an older
    // function set (extensions from a previous build) still picks it up
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(substrWindowsName))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        dotName, exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        cosName, exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        simhashName, simhashBuilder, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        normalizeName, normalizeBuilder, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        shinglesName, shinglesBuilder, "scala_udf")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        substrWindowsName, substrWindowsBuilder, "scala_udf")
    }
  }
}
