package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pearson chi-squared test of independence between two categorical
  * columns — the classical companion to [[MutualInfo]] (MI says how MUCH
  * the columns co-vary; chi² + Cramér's V say whether the association is
  * bigger than chance and how strong it is on a 0..1 scale).
  *
  * The textbook Σ (o−e)²/e ranges over EVERY cell of the r×c grid,
  * including cells with zero observed count — but a groupBy only emits
  * observed cells. Rather than generating the dense grid, the statistic
  * is computed through the algebraic identity
  *
  *   chi² = n · Σ_observed o²/(c_x·c_y) − n
  *
  * (expand (o−e)²/e = o²/e − 2o + e with e = c_x·c_y/n; unobserved cells
  * contribute only their e, and Σ_all e = Σ_all o = n), so the sum needs
  * observed cells ONLY. o², o²·n, and the marginal product stay exact
  * integers; the one float op per cell is the division, and the final
  * subtraction/sqrt are single ops on the summed double.
  *
  * Scale shape: identical to MutualInfo — one scan feeds the joint-count
  * aggregate (shuffle sized |X|·|Y|, the contingency table, not the
  * data); marginals re-aggregate the JOINT table; assembly is broadcast
  * joins of tiny frames. dof and Cramér's V come from the marginal
  * cardinalities, exact integers until the final closed form.
  */
object ChiSquare {

  /** Single-row result: (n, nx, ny, dof, chi2, cramers_v) — nx/ny are the
    * marginal cardinalities ("rows"/"cols" of the grid; those names are
    * reserved words in some engines, so the neutral spellings travel).
    */
  def independence(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val joint = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(xCol, yCol).agg(count(lit(1)).as("c_xy"))
    val xs = joint.groupBy(xCol).agg(sum("c_xy").as("c_x"))
    val ys = joint.groupBy(yCol).agg(sum("c_xy").as("c_y"))
    val tot = joint.agg(sum("c_xy").as("n"))
    val nx = xs.agg(count(lit(1)).as("nx"))
    val ny = ys.agg(count(lit(1)).as("ny"))

    // per-cell o²·n/(c_x·c_y): both operands are exact integers that fit a
    // double's 2^53 integer range for any realistic contingency input
    // (o²·n ≤ n³ only when one cell holds everything; the real bound is
    // o ≤ min(c_x, c_y) so o²·n ≤ n·c_x·c_y ≤ n³ but ~1e15 at sf0.1), so
    // the ONE float op per cell is a division of exactly-represented
    // integers — identical IEEE754 on any engine. Spark decimal division
    // is deliberately avoided: it rounds to the result scale, which is
    // NOT the double rounding the oracle's division performs.
    val term = (col("c_xy").cast("decimal(38,0)") *
      col("c_xy").cast("decimal(38,0)") *
      col("n").cast("decimal(38,0)")).cast("double") /
      (col("c_x").cast("decimal(38,0)") * col("c_y").cast("decimal(38,0)"))
        .cast("double")

    joint
      .join(xs, xCol).join(ys, yCol).crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(term).as("sum_terms"))
      .crossJoin(broadcast(nx)).crossJoin(broadcast(ny))
      .select(
        col("n"), col("nx"), col("ny"),
        ((col("nx") - 1) * (col("ny") - 1)).as("dof"),
        (col("sum_terms") - col("n").cast("double")).as("chi2"),
        when(col("n") > 0 && least(col("nx"), col("ny")) > 1,
          sqrt((col("sum_terms") - col("n").cast("double")) /
            (col("n").cast("double") *
              (least(col("nx"), col("ny")) - 1).cast("double"))))
          .otherwise(lit(0.0)).as("cramers_v"))
  }
}
