package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Holt's linear-trend (double) exponential smoothing as an ordered-fold
  * `Aggregator` — the level+trend forecaster for per-group time series
  * ([[graft.operators.Ewma]] handles the trendless case). The recurrence
  *
  *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1},  l_1 = x_1, b_1 = 0
  *
  * is inherently sequential, so the buffer accumulates the group's
  * (bucket, value) pairs — merge is concatenation (order-free), the fold
  * happens ONCE in finish over the sorted series. State is
  * SERIES-LENGTH-sized (time grain × span, e.g. 8 760 hourly buckets per
  * year), bounded by the calendar — never by row count, which is what
  * makes this shape safe at 100 TB where per-row state would not be.
  *
  * Determinism: the fold is pure +/−/× in a fixed order, so the result is
  * BIT-IDENTICAL to any IEEE engine replaying the same recurrence — the
  * DuckDB oracle is a recursive CTE with the identical expression shapes
  * (complements spelled `1.0 − α`, never a pre-folded 0.7, because
  * `1−0.3` and the literal `0.7` can round to different doubles).
  */
final class HoltSmooth(alpha: Double, beta: Double)
  extends Aggregator[(Long, Long), Vector[(Long, Long)], HoltSmooth.Fit] {

  require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)

  override def zero: Vector[(Long, Long)] = Vector.empty

  override def reduce(b: Vector[(Long, Long)],
                      x: (Long, Long)): Vector[(Long, Long)] = b :+ x

  override def merge(a: Vector[(Long, Long)],
                     b: Vector[(Long, Long)]): Vector[(Long, Long)] = a ++ b

  override def finish(buf: Vector[(Long, Long)]): HoltSmooth.Fit = {
    if (buf.isEmpty)
      HoltSmooth.Fit(0L, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    else {
      val xs = buf.sortBy(_._1).map(_._2.toDouble)
      var l = xs.head
      var b = 0.0
      var t = 1
      // rolling-origin backtest rides the same fold: before absorbing
      // x_t, (l+b) IS the one-step-ahead forecast of x_t — the residual
      // sums cost nothing extra and stay in the same fixed operation
      // order the oracle's recursion replays
      var sae = 0.0
      var se2 = 0.0
      while (t < xs.length) {
        val e = xs(t) - (l + b)
        sae = sae + math.abs(e)
        se2 = se2 + e * e
        val lPrev = l
        l = alpha * xs(t) + (1.0 - alpha) * (l + b)
        b = beta * (l - lPrev) + (1.0 - beta) * b
        t += 1
      }
      HoltSmooth.Fit(xs.length.toLong, l, b, sae, se2)
    }
  }

  override def bufferEncoder: Encoder[Vector[(Long, Long)]] =
    Encoders.kryo[Vector[(Long, Long)]]
  override def outputEncoder: Encoder[HoltSmooth.Fit] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HoltSmooth.Fit]()
}

object HoltSmooth {
  /** sae/se2: one-step-ahead |error| and error² sums over t = 2..n (the
    * rolling-origin backtest accumulated inside the fold itself).
    */
  final case class Fit(n_buckets: Long, level: Double, trend: Double,
                       sae: Double, se2: Double)
}
