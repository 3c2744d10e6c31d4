package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch — KLL-style level compactors as a typed
  * `Aggregator`, completing the engine's mergeable-sketch family
  * (approx-distinct = built-in HLL, heavy hitters = [[MisraGries]],
  * quantiles = this). An item in level i stands for 2^i originals; when a
  * level overflows `k` items it sorts and keeps alternate items into the
  * level above (halving the footprint, doubling the weight). Unlike
  * textbook KLL the compaction offset is FIXED (keep even ranks), trading
  * the randomized variance bound for determinism on a fixed partitioning —
  * rank error stays bounded by the compaction count (each compaction of
  * level i perturbs a rank by ≤ 2^i), empirically ≲ 1.5/k·n per level on
  * the spec's distributions; QuantileSketchSpec pins it.
  *
  * Merge concatenates levels pairwise and re-compacts — associative up to
  * the bounded compaction error, so Spark can combine partial sketches
  * map-side like any built-in aggregate: the whole point vs exact
  * `percentile`, whose state is every value. Buffer is O(k·levels) =
  * O(k log(n/k)) doubles regardless of group size.
  *
  * Estimates are rank-based: the weighted item whose cumulative weight
  * first reaches p·n (lower nearest-rank on the weighted sample); exact
  * (= nearest-rank percentile of the data) while n ≤ k, since nothing has
  * compacted.
  */
final class QuantileSketch(k: Int, probs: Seq[Double])
  extends Aggregator[Double, QuantileSketch.Levels, Seq[Double]] {

  require(k >= 8, "k must be >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))

  import QuantileSketch._

  override def zero: Levels = Levels(Vector(Vector.empty))

  override def reduce(b: Levels, x: Double): Levels =
    compact(Levels(b.lv.updated(0, b.lv(0) :+ x)), k)

  override def merge(a: Levels, b: Levels): Levels = {
    val n = math.max(a.lv.size, b.lv.size)
    def at(l: Levels, i: Int) = if (i < l.lv.size) l.lv(i) else Vector.empty
    compact(Levels((0 until n).toVector.map(i => at(a, i) ++ at(b, i))), k)
  }

  override def finish(r: Levels): Seq[Double] = {
    val weighted = r.lv.zipWithIndex.flatMap { case (buf, i) =>
      buf.map(v => (v, 1L << i))
    }.sortBy(_._1)
    if (weighted.isEmpty) probs.map(_ => Double.NaN)
    else {
      val total = weighted.map(_._2).sum
      probs.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var acc = 0L
        weighted.find { case (_, w) => acc += w; acc >= target }.get._1
      }
    }
  }

  override def bufferEncoder: Encoder[Levels] = Encoders.kryo[Levels]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object QuantileSketch {

  /** level i holds items each standing for 2^i originals. */
  final case class Levels(lv: Vector[Vector[Double]]) extends Serializable

  /** Cascade compaction: any level over `k` sorts and promotes the even
    * ranks of an even-sized prefix to the level above (each promoted item
    * doubles in weight, so total weight is conserved exactly); on an odd
    * size the max stays behind — deterministic offset throughout.
    */
  private[functions] def compact(in: Levels, k: Int): Levels = {
    var lv = in.lv
    var i = 0
    while (i < lv.size) {
      if (lv(i).size > k) {
        val sorted = lv(i).sorted
        val (body, rest) =
          if (sorted.size % 2 == 0) (sorted, Vector.empty[Double])
          else (sorted.init, Vector(sorted.last))
        val keep = body.indices.collect { case j if j % 2 == 0 => body(j) }
        if (i + 1 >= lv.size) lv = lv :+ Vector.empty[Double]
        lv = lv.updated(i, rest).updated(i + 1, lv(i + 1) ++ keep)
      }
      i += 1
    }
    Levels(lv)
  }
}
