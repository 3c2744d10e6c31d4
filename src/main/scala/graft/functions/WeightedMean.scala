package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for the closed-weighted mean (the shape of the
  * reference's `weighted_avg` closure, reference `gold.py:137-140`).
  *
  * The production gold path computes this as plain `sum(x*w)/sum(w)`
  * expressions (SURVEY §2.11: no UDAF needed — expressions keep codegen);
  * this Aggregator is the engine's canonical example of the typed custom-
  * aggregate surface for cases that genuinely need state Spark can't
  * express (mergeable sketches, exotic accumulators). Buffer is (Σxw, Σw);
  * merge is associative, so it combines map-side like any built-in.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  /** NaN marks zero total weight (the closure's `None`); callers translate
    * with `nanvl`/filters as needed.
    */
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
