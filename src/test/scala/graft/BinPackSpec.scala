package graft

import graft.operators.BinPack
import org.apache.spark.sql.functions._

/** No-split packer invariants: the hand-traced next-fit-decreasing walk,
  * own-bin handling of over-capacity docs, dense bin ids, token
  * conservation, and partitioning invariance.
  */
class BinPackSpec extends SparkSpec {
  import spark.implicits._

  // one shard (nShards = 1) so the walk order is just (tokens DESC, id)
  private def pack(docs: Seq[(Long, String)], cap: Long) =
    BinPack.nfdPack(docs.toDF("doc_id", "text"), cap, "s", nShards = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1) // (doc_id, bin, pos_in_bin, offset_in_bin)

  test("hand-traced NFD walk: decreasing order, next-fit boundaries") {
    // tokens: d1=5, d2=4, d3=3, d4=2, d5=1; capacity 7
    // walk 5,4,3,2,1 → bin0: 5 (5+4>7) | bin1: 4+3 (7+2>7) | bin2: 2+1
    val docs = Seq(
      (1L, "a a a a a"), (2L, "b b b b"), (3L, "c c c"),
      (4L, "d d"), (5L, "e"))
    assert(pack(docs, 7).toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 1L, 0L, 0L), (3L, 1L, 1L, 4L),
      (4L, 2L, 0L, 0L), (5L, 2L, 1L, 2L)))
  }

  test("over-capacity doc takes its own over-full bin; ids stay dense") {
    // d1=9 > cap 4 → own bin 0 (fill 9); d2=3, d3=2 → 3+2>4 so bins 1, 2
    val docs = Seq((1L, Seq.fill(9)("x").mkString(" ")),
      (2L, "y y y"), (3L, "z z"))
    assert(pack(docs, 4).toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 1L, 0L, 0L), (3L, 2L, 0L, 0L)))
    val rep = BinPack.binReport(
      BinPack.nfdPack(docs.toDF("doc_id", "text"), 4, "s", 1), 4)
      .orderBy("bin").collect()
    assert(rep.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L)) // dense bins
    assert(rep(0).getDouble(4) > 1.0)                      // over-full
  }

  test("token conservation and partitioning invariance on real docs") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val a = BinPack.nfdPack(docs, 192, "nf0", 16)
    val b = BinPack.nfdPack(docs.repartition(13), 192, "nf0", 16)
    assert(a.collect().map(_.toSeq).toSet == b.collect().map(_.toSeq).toSet)
    // every token lands in exactly one (bin, offset) slot
    val total = docs.select(sum(size(
      graft.functions.TextFunctions.tokens(col("text"))))).first().getLong(0)
    val packed = a.agg(sum("n_tokens")).first().getLong(0)
    assert(packed == total)
    // offsets tile each bin: max(offset + n_tokens) == bin fill
    val bad = a.groupBy("shard", "bin")
      .agg(max(col("offset_in_bin") + col("n_tokens")).as("hi"),
        sum(col("n_tokens")).as("fill"))
      .filter(col("hi") =!= col("fill")).count()
    assert(bad == 0)
  }
}
