package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePrep

/** Concat-and-chunk layout invariants: the bucketed two-phase cumsum must
  * equal the direct one-window layout, blocks must tile the token stream
  * with zero gaps, and the block report must conserve token mass.
  */
class SequencePackSpec extends SparkSpec {
  import spark.implicits._

  // ~40 docs with 1..23-token texts (several spanning multiple 16-token
  // blocks, several sub-block)
  private def docs = (0 until 40)
    .map(i => (i.toLong, Seq.fill(1 + (i * 7) % 23)("w").mkString(" ")))
    .toDF("doc_id", "text")

  private val cap = 16L

  test("layout equals the direct one-window spelling") {
    val got = SequencePrep.concatLayout(docs, cap, "s1")
      .select("doc_id", "n_tokens", "start_block", "offset_in_block",
        "end_block", "blocks_spanned")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap

    // direct replay: one global sort on the same seeded key
    val direct = docs
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long")
        .as("n"))
      .withColumn("k", md5(concat_ws(":", lit("s1"),
        col("doc_id").cast("string"))))
      .orderBy("k", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    direct.foreach { case (id, n) =>
      val lo = cum; cum += n
      val (gn, gs, go, ge, gb) = got(id)
      assert(gn == n, s"doc $id n_tokens")
      assert(gs == lo / cap, s"doc $id start_block")
      assert(go == lo % cap, s"doc $id offset")
      assert(ge == (cum - 1) / cap, s"doc $id end_block")
      assert(gb == ge - gs + 1, s"doc $id span")
    }
  }

  test("layout tiles the stream: next doc starts where the previous ended") {
    val rows = SequencePrep.concatLayout(docs, cap, "s1")
      .select(col("start_block") * cap + col("offset_in_block"),
        col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    rows.sliding(2).foreach {
      case Array((lo1, n1), (lo2, _)) => assert(lo1 + n1 == lo2)
      case _ => ()
    }
    assert(rows.head._1 == 0L)
  }

  test("block report conserves token mass and fills every non-tail block") {
    val layout = SequencePrep.concatLayout(docs, cap, "s1")
    val total = layout.agg(sum("n_tokens")).head.getLong(0)
    val rep = SequencePrep.blockReport(layout, cap)
      .collect().map(r => (r.getAs[Long]("block"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_starts"), r.getAs[Long]("n_tokens")))
      .sortBy(_._1)
    // dense block ids, mass conserved
    assert(rep.map(_._1).toSeq == (0L until rep.length.toLong))
    assert(rep.map(_._4).sum == total)
    // every block but the last holds exactly `cap` tokens; starts ≤ docs
    rep.init.foreach { case (b, d, s, n) =>
      assert(n == cap, s"block $b fill"); assert(s <= d)
    }
    assert(rep.last._4 == total - cap * (rep.length - 1))
  }

  test("partitioning invariance") {
    val a = SequencePrep.concatLayout(docs.repartition(7), cap, "s1")
      .select("doc_id", "start_block", "offset_in_block").collect().toSet
    val b = SequencePrep.concatLayout(docs.coalesce(1), cap, "s1")
      .select("doc_id", "start_block", "offset_in_block").collect().toSet
    assert(a == b)
  }
}
