package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable logistic-regression classifier by full-batch gradient descent —
  * the fasttext-style linear quality/language filter trained INSIDE the
  * engine (reference corpora train such filters offline and apply them at
  * scale; here both halves are the same Spark job).
  *
  * Scale shape: one cached feature pass, then `iters` rounds of exactly one
  * map-side-combining aggregate each (d+1 gradient sums — partial
  * aggregation does the heavy lifting, the shuffle is d+1 doubles per
  * partition). Model state is d+1 doubles on the driver, like
  * [[Pca]]/[[Similarity.kmeansCentroids]]; the corpus is never shuffled.
  *
  * Determinism: weights round to 9 dp after every update — gradient sums
  * are doubles, so sub-ulp association noise exists, but it sits ~1e4
  * below the rounding grid; with both engines rounding at each step the
  * weight TRAJECTORY is reproducible, not just the final loss (the same
  * discipline as [[Pca]]'s rounded loadings). Features must be exact
  * rationals of the data (integer counts / constants) for this to hold.
  */
object LogReg {

  /** `iters` full-batch GD steps of logistic regression on `features`
    * (bias prepended) against 0/1 `label`; returns the d+1 weights.
    * `df` should be cached by the caller if reused afterwards.
    */
  def train(df: DataFrame, features: Seq[Column], label: Column,
            iters: Int, eta: Double): Array[Double] = {
    require(iters >= 1 && iters <= 64, "iters must be in [1, 64]")
    val d = features.length
    val feat = df.select(features.zipWithIndex.map { case (f, j) =>
      f.cast("double").as(s"f$j") } :+ label.cast("double").as("y"): _*)
      .localCheckpoint(eager = false)
    var w = new Array[Double](d + 1)
    for (_ <- 1 to iters) {
      val err = sigmoid(z(w, d)) - col("y")
      val grads = feat.agg(
        sum(err).as("g0"),
        (0 until d).map(j => sum(err * col(s"f$j")).as(s"g${j + 1}")) :+
          count(lit(1)).cast("double").as("n"): _*).head()
      val n = grads.getDouble(d + 1)
      w = w.indices.map { j =>
        BigDecimal(w(j) - eta * grads.getDouble(j) / n)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toArray
    }
    w
  }

  /** p = σ(w·x) column for trained weights over the same feature layout. */
  def predict(w: Array[Double], features: Seq[Column]): Column =
    sigmoid(features.zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * f.cast("double")
    })

  private def sigmoid(zc: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-zc))

  private def z(w: Array[Double], d: Int): Column =
    (0 until d).foldLeft(lit(w(0)): Column) { (acc, j) =>
      acc + lit(w(j + 1)) * col(s"f$j")
    }

  /** DuckDB replay: the identical unrolled iteration chain over a `feat`
    * CTE with columns f0..f{d-1}, y — per-step 9-dp weight rounding, same
    * left-fold z order, same sum/count gradient. Returns the CTE chain
    * text ending in a weights CTE named `wfin` with columns w0..wd.
    */
  def oracleCtes(d: Int, iters: Int, eta: Double): String = {
    def zSql(wCte: String) =
      (0 until d).foldLeft(s"(SELECT w0 FROM $wCte)") { (acc, j) =>
        s"$acc + (SELECT w${j + 1} FROM $wCte) * f$j"
      }
    val w0 = s"w0_ AS MATERIALIZED (SELECT ${(0 to d).map(j => s"0.0 AS w$j").mkString(", ")})"
    val steps = (1 to iters).map { t =>
      val prev = if (t == 1) "w0_" else s"w${t - 1}_"
      val p = s"p${t}_ AS MATERIALIZED (SELECT f.*, 1.0/(1.0 + exp(-(${zSql(prev)}))) AS p FROM feat f)"
      val ws = (0 to d).map { j =>
        val gx = if (j == 0) "(p - y)" else s"(p - y) * f${j - 1}"
        s"round((SELECT w$j FROM $prev) - $eta * sum($gx) / count(*), 9) AS w$j"
      }.mkString(",\n       ")
      s"$p,\nw${t}_ AS MATERIALIZED (SELECT $ws FROM p${t}_)"
    }
    (w0 +: steps).mkString(",\n") + s",\nwfin AS MATERIALIZED (SELECT * FROM w${iters}_)"
  }
}
