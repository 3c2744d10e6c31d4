package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row inside the top-k buffer: `value` ranks descending,
  * `id` breaks ties ascending (total order → engine-stable output).
  */
final case class Scored(value: Long, id: Long)

/** Mergeable per-group top-k as a typed `Aggregator` — the scale path for
  * "top N rows per group". The window-function plan (`row_number` over
  * (group, value desc)) shuffles and SORTS every row of every group; this
  * runs as one hash aggregate whose partial state is k pairs per group —
  * map-side combine shrinks each partition's contribution to k before the
  * exchange, and the merge is associative (same reason `max` scales).
  * At a billion rows per group the window sorts a billion rows; this
  * moves k.
  *
  * The buffer is kept sorted best-first, so `reduce` is O(1) for the
  * common below-threshold row (compare against the current k-th) and
  * O(k) only on insertion; `finish` emits the ranked array directly —
  * `posexplode` downstream turns position into the 1-based rank the
  * window plan would have produced. Ordering is (value desc, id asc),
  * a total order, so Spark and any SQL replay agree bit-for-bit.
  */
final class GroupTopK(k: Int)
  extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be > 0")

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.value, s.id))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(b: Seq[Scored], x: Scored): Seq[Scored] =
    if (b.size >= k && ord.gteq(x, b.last)) b // below the k-th: skip in O(1)
    else ((b :+ x).sorted(ord)).take(k)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r // sorted best-first

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
