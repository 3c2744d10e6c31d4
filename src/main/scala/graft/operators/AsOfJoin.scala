package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, attach the nearest right row within the
  * same key — backward (`right.ts <= left.ts`, latest), forward
  * (`right.ts >= left.ts`, earliest) or nearest (closer of the two; ties
  * prefer backward) — the operator Spark lacks natively (SURVEY.md §2.4;
  * the scale-path primitive for event attribution, slowly-changing lookups,
  * tick data). Direction surface mirrors DuckDB/pandas `merge_asof`.
  *
  * Implementation composes built-ins (preference (a) over a custom
  * SparkPlan): tag both sides, union, and per-key `last(_, ignoreNulls)`
  * over a ts-ordered running window carries the most recent right row onto
  * each left row. One shuffle on the key, one sort per direction — NO range
  * explosion, no per-row scan of the right side; skew follows the key
  * distribution exactly like any keyed window.
  *
  * The ENTIRE right row travels as ONE struct, so every carried field —
  * payload and the right row's own ts — comes from the SAME matched row;
  * a null payload value on the matched row stays null instead of leaking
  * from an older row (true as-of semantics).
  *
  * Tie rules: a right row at exactly left.ts matches in every direction.
  * Among equal-ts right rows, backward picks the LAST by `tieCol` and
  * forward the FIRST — pass a unique column for full determinism.
  */
object AsOfJoin {

  /** `toleranceSeconds`: when set, a carried right row farther than the
    * tolerance is treated as no-match (payload nulled) — correct because
    * the carried row is the NEAREST eligible one, so every other candidate
    * is farther still.
    */
  def asofLeft(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String],
               tieCol: String,
               toleranceSeconds: Option[Long] = None,
               direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction $direction")
    val leftCols = left.columns.toSeq
    require(!payloadCols.contains(tsCol), "payload must not shadow ts")

    // the right row's own ts travels inside the struct so tolerance and
    // nearest-side selection evaluate against the matched row itself
    val carryCols = payloadCols :+ tsCol
    val rType = StructType(carryCols.map(c =>
      StructField(c, right.schema(c).dataType)))
    val taggedLeft = left.withColumn("_is_left", lit(1))
      .withColumn("_r", lit(null).cast(rType))
    val taggedRight = {
      // tieCol is shared: it orders equal-ts right rows, so it must carry
      // the RIGHT side's value there (left-only columns become null)
      val base = right.select(
        (Seq(col(keyCol), col(tsCol), col(tieCol)) :+
          struct(carryCols.map(c => col(c).as(c)): _*).as("_r")): _*)
        .withColumn("_is_left", lit(0))
      leftCols.filterNot(c => c == keyCol || c == tsCol || c == tieCol)
        .foldLeft(base) { (df, c) =>
          df.withColumn(c, lit(null).cast(left.schema(c).dataType))
        }
    }
    val unioned = taggedLeft.unionByName(taggedRight)

    // right rows order before left rows at equal ts (inclusive match);
    // last(ignoreNulls) over the running frame carries the nearest right
    // struct. The backward scan runs ts-ascending; the forward scan is the
    // same construction mirrored to ts-descending.
    def runningCarry(df: DataFrame, out: String, forward: Boolean): DataFrame = {
      val w = (if (forward)
        Window.partitionBy(keyCol)
          .orderBy(col(tsCol).desc, col("_is_left").asc, col(tieCol).desc_nulls_first)
      else
        Window.partitionBy(keyCol)
          .orderBy(col(tsCol).asc, col("_is_left").asc, col(tieCol).asc_nulls_first))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn(out, last(col("_r"), ignoreNulls = true).over(w))
    }

    // distance arithmetic in EXACT integer microseconds (unix_micros), not
    // double seconds: at epoch magnitude a double carries ~2^-21 s of
    // rounding, enough to flip a near-equidistant side pick or a borderline
    // tolerance against an exact-integer oracle. Non-timestamp ts columns
    // (numeric, in unit tests) scale by 1e6 through the same exact path.
    def asMicros(c: Column): Column =
      if (left.schema(tsCol).dataType.typeName == "timestamp") unix_micros(c)
      else (c.cast("double") * 1e6).cast("long")

    val carried = direction match {
      case "backward" => runningCarry(unioned, "_rm", forward = false)
      case "forward"  => runningCarry(unioned, "_rm", forward = true)
      case "nearest"  =>
        val both = runningCarry(runningCarry(unioned, "_rb", forward = false),
          "_rf", forward = true)
        val db = asMicros(col(tsCol)) - asMicros(col("_rb").getField(tsCol))
        val df2 = asMicros(col("_rf").getField(tsCol)) - asMicros(col(tsCol))
        both.withColumn("_rm",
          when(col("_rb").isNotNull && (col("_rf").isNull || db <= df2), col("_rb"))
            .otherwise(col("_rf")))
          .drop("_rb", "_rf")
    }

    val delta = abs(asMicros(col(tsCol)) - asMicros(col("_rm").getField(tsCol)))
    val withinTol = toleranceSeconds match {
      case Some(tol) => col("_rm").isNotNull && delta <= tol * 1000000L
      case None      => lit(true)
    }
    carried
      .filter(col("_is_left") === 1)
      .select((leftCols.map(col) ++
        payloadCols.map(c =>
          when(withinTol, col("_rm").getField(c)).as(s"right_$c"))): _*)
  }
}
