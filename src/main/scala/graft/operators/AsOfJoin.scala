package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same key — the operator Spark lacks
  * natively (SURVEY.md §2.4 notes the reference has no non-equi joins; this
  * is the scale-path primitive for event attribution, slowly-changing
  * lookups, tick data).
  *
  * Implementation composes built-ins (preference (a) over a custom
  * SparkPlan): tag both sides, union, and per-key `last(_, ignoreNulls)`
  * over a ts-ordered running window carries the most recent right payload
  * onto each left row. One shuffle on the key, one sort — NO range
  * explosion, no per-row scan of the right side; skew follows the key
  * distribution exactly like any keyed window.
  *
  * Tie rule: a right row at exactly left.ts matches (<=); right rows sort
  * before left rows at equal ts. Among equal-ts right rows the last by
  * `tieCol` wins — pass a unique column for full determinism.
  */
object AsOfJoin {

  /** `toleranceSeconds`: when set, a carried right row older than the
    * tolerance is treated as no-match (payload nulled) — correct because
    * the carried row is the LATEST eligible one, so every other candidate
    * is older still.
    */
  def asofLeft(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               tieCol: String,
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!payloadCols.contains(tsCol), "payload must not shadow ts")

    // the right row's own ts travels as an implicit payload so tolerance
    // can be evaluated after the carry
    val carryCols = payloadCols :+ tsCol
    val taggedLeft = carryCols
      .foldLeft(left.withColumn("_is_left", lit(1))) { (df, c) =>
        df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
      }
    val taggedRight = {
      // tieCol is shared: it orders equal-ts right rows, so it must carry
      // the RIGHT side's value there (left-only columns become null)
      val base = right.select(
        (Seq(col(keyCol), col(tsCol), col(tieCol)) ++
          carryCols.map(c => col(c).as(s"_r_$c"))): _*)
        .withColumn("_is_left", lit(0))
      leftCols.filterNot(c => c == keyCol || c == tsCol || c == tieCol)
        .foldLeft(base) { (df, c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }

    // right rows order before left rows at equal ts (inclusive <=); the
    // tie column makes the "latest" among equal-ts right rows deterministic
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_is_left").asc, col(tieCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = carryCols.foldLeft(taggedLeft.unionByName(taggedRight)) {
      (df, c) => df.withColumn(s"_r_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    val withinTol = toleranceSeconds match {
      case Some(tol) =>
        col(s"_r_$tsCol").isNotNull &&
          (col(tsCol).cast("double") - col(s"_r_$tsCol").cast("double")) <= tol.toDouble
      case None => lit(true)
    }
    carried
      .filter(col("_is_left") === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(c => when(withinTol, col(s"_r_$c")).as(s"right_$c"))): _*)
  }
}
