package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` entry point: wire with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * `GraftSession.builder` sets it by default, so every engine session
  * carries the full SQL surface.
  *
  * Injects the engine's native functions into the session's function
  * registry so they are usable from SQL (`SELECT graft_dot(a, b)`) as well
  * as the Column API, and the post-hoc resolution rule that lands SQL-text
  * `UPDATE` / `MERGE INTO` on the governed table's own copy-on-write
  * commit protocol (`graft.sources.GraftSqlDml`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPostHocResolutionRule(session =>
      new graft.sources.GraftSqlDml.GraftSqlDmlRule(session))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.dotName),
      new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.dotName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.cosName),
      new ExpressionInfo(classOf[CosineSim].getName, GraftFunctions.cosName),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.simhashName),
      new ExpressionInfo(classOf[SimHashExpr].getName,
        GraftFunctions.simhashName),
      GraftFunctions.simhashBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.normalizeName),
      new ExpressionInfo(classOf[NormalizeExpr].getName,
        GraftFunctions.normalizeName),
      GraftFunctions.normalizeBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.shinglesName),
      new ExpressionInfo(classOf[ShinglesExpr].getName,
        GraftFunctions.shinglesName),
      GraftFunctions.shinglesBuilder))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.substrWindowsName),
      new ExpressionInfo(classOf[SubstrWindowsExpr].getName,
        GraftFunctions.substrWindowsName),
      GraftFunctions.substrWindowsBuilder))
  }
}
