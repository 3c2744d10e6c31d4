package graft

import graft.functions.{GroupTopK, Scored}
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the mergeable top-k buffer — the oracle
  * (`rel_group_topk_agg`) pins plan-level parity with the window replay;
  * this pins the aggregator algebra itself: bounded state, total-order
  * tiebreak, merge associativity/commutativity over arbitrary splits.
  */
class GroupTopKSpec extends AnyFunSuite {

  private val agg = new GroupTopK(3)

  private def run(xs: Seq[Scored]): Seq[Scored] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("keeps the k best by (value desc, id asc) with bounded state") {
    val xs = Seq(Scored(5, 10), Scored(9, 2), Scored(5, 3), Scored(1, 1),
      Scored(9, 7), Scored(2, 4))
    val out = run(xs)
    assert(out === Seq(Scored(9, 2), Scored(9, 7), Scored(5, 3)))
    assert(out.size == 3)
  }

  test("below-threshold rows never enter the buffer") {
    val full = run(Seq(Scored(10, 1), Scored(9, 1), Scored(8, 1)))
    assert(agg.reduce(full, Scored(7, 99)) === full)
    // equal to the current k-th with a LARGER id also stays out
    assert(agg.reduce(full, Scored(8, 2)) === full)
    // equal value, smaller id displaces
    assert(agg.reduce(full, Scored(8, 0)).last === Scored(8, 0))
  }

  test("merge agrees with any split of the input (associative + commutative)") {
    val xs = (1 to 40).map(i => Scored((i * 7) % 11, i.toLong))
    val whole = run(xs)
    for (cut <- Seq(1, 13, 20, 39)) {
      val (a, b) = xs.splitAt(cut)
      assert(agg.merge(run(a), run(b)) === whole)
      assert(agg.merge(run(b), run(a)) === whole)
    }
    assert(agg.merge(agg.zero, whole) === whole)
  }
}
