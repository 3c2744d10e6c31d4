package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 interval build: a per-key change
  * stream (one row per observed state) becomes validity intervals —
  * `valid_from` = the change's own timestamp, `valid_to` = the NEXT
  * change's timestamp (open interval end), `is_current` on the last row.
  * The classic warehouse dimension-history shape; as-of joining a fact to
  * the dimension state then becomes a plain range predicate
  * (`valid_from <= fact_ts < valid_to`) — see [[RangeJoin]]/[[AsOfJoin]]
  * for the scalable join itself.
  *
  * One window over (key, ts asc, tiebreak asc) — a single shuffle on the
  * key, `lead` within each partition's sorted run, no self-join (the
  * naive "join each change to the min later change" is a quadratic
  * correlated subquery at scale).
  *
  * Determinism: same-timestamp changes for one key are real (batch loads
  * stamp whole files with one ts), so the caller supplies `tieCol` —
  * ordering is (ts, tieCol), a total order whenever (key, ts, tieCol) is
  * unique, and every replay (including a SQL oracle) lands identical
  * intervals. Null timestamps are dropped: an undated change has no place
  * on the timeline.
  */
object Scd {

  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 requires at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    changes
      .filter(col(tsCol).isNotNull)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
