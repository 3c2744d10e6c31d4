package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutual information between two categorical columns — the feature-
  * selection / corpus-diagnostic score ("how much does `source` predict
  * `lang`?"). Reports MI in nats plus both marginal entropies and the
  * normalized MI (MI / sqrt(Hx·Hy), the symmetric uncertainty variant),
  * all from EXACT integer contingency counts.
  *
  * Scale shape: ONE scan of the input feeds a joint-count aggregate
  * (shuffle sized |X|·|Y| — the contingency table, not the data); the
  * marginals and grand total are re-aggregations OF THE JOINT TABLE, so
  * the raw data is never re-read. The final assembly is broadcast joins
  * of single-row / marginal-sized frames. The only float work is the
  * per-cell p·ln(...) terms and their sum over the contingency cells —
  * association-order noise lives far below the published 6-decimal
  * rounding for any real cardinality.
  */
object MutualInfo {

  /** Single-row result: (n, cells, h_x, h_y, mi_nats, nmi). */
  def categorical(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(xCol, yCol).agg(count(lit(1)).as("c_xy"))
    val xs = joint.groupBy(xCol).agg(sum("c_xy").as("c_x"))
    val ys = joint.groupBy(yCol).agg(sum("c_xy").as("c_y"))
    val tot = joint.agg(sum("c_xy").as("n"))

    def p(c: String) = col(c).cast("double") / col("n").cast("double")
    // entropies from the marginal frames (cell arithmetic mirrored in SQL)
    val hx = xs.crossJoin(broadcast(tot))
      .agg(sum(-p("c_x") * log(p("c_x"))).as("h_x"))
    val hy = ys.crossJoin(broadcast(tot))
      .agg(sum(-p("c_y") * log(p("c_y"))).as("h_y"))

    val mi = joint
      .join(xs, xCol).join(ys, yCol).crossJoin(broadcast(tot))
      .agg(
        max(col("n")).as("n"),
        count(lit(1)).as("cells"),
        sum(p("c_xy") * log(p("c_xy") / (p("c_x") * p("c_y"))))
          .as("mi_nats"))

    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(col("n"), col("cells"), col("h_x"), col("h_y"), col("mi_nats"),
        when(col("h_x") * col("h_y") > 0,
          col("mi_nats") / sqrt(col("h_x") * col("h_y")))
          .otherwise(lit(0.0)).as("nmi"))
  }
}
