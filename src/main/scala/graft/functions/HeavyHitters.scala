package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory path to "top terms" when even the DISTINCT token set
  * doesn't fit anywhere (at 100 TB an exact token count is a full shuffle
  * of the vocabulary; this is one pass, k counters per partition, merged
  * map-side like any associative aggregate).
  *
  * Summaries are mergeable with the Agarwal et al. rule ("Mergeable
  * Summaries", PODS'12): add counters, then subtract the (k+1)-th largest
  * count and drop non-positives. The classic guarantee survives merging:
  * for every item, `true - N/(k+1) <= est <= true`, and every item with
  * true frequency > N/(k+1) is present in the summary (pinned in
  * HeavyHittersSpec against exact counts).
  *
  * The buffer is an immutable Map for clarity; a production tuning would
  * swap a mutable open-hash map inside reduce (the buffer only serializes
  * at partition boundaries), but the asymptotics are already right: O(k)
  * state, O(1) amortized per element.
  */
final class MisraGries(k: Int)
  extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c)             => b.updated(x, c + 1)
      case None if b.size < k  => b.updated(x, 1L)
      case None                => // decrement-all: every survivor pays one
        b.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (key, c) =>
        if (c - cut > 0) Some(key -> (c - cut)) else None
      }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
