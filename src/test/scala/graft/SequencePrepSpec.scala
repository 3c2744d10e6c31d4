package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePrep

/** Sequence-prep contracts: chunk coverage/overlap arithmetic and the
  * packing invariants (budget respected, every doc placed once, bins
  * reasonably full).
  */
class SequencePrepSpec extends SparkSpec {
  import spark.implicits._

  test("chunking covers every token with the configured stride and overlap") {
    val docs = Seq((1L, (1 to 300).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = SequencePrep.chunkTokens(docs, chunkTokens = 128, overlap = 32)
      .orderBy("chunk_idx").collect()
    // n=300, stride 96: ceil((300-32)/96) = 3 chunks
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("first_token")).toSeq ==
      Seq("t1", "t97", "t193"))                  // stride advances by 96
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq ==
      Seq(128L, 128L, 108L))                     // last chunk clamps
  }

  test("short docs yield exactly one chunk; empty docs none") {
    val docs = Seq((1L, "a b c"), (2L, "   ")).toDF("doc_id", "text")
    val out = SequencePrep.chunkTokens(docs, 128, 32).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_tokens") == 3L)
  }

  test("packing: budget respected, every doc placed once, bins well-filled") {
    val docs = Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), size(graft.functions.TextFunctions
        .tokens(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val budget = 256L
    val packed = SequencePrep.packGreedy(docs, budget)
    assert(packed.count() == docs.count()) // every doc placed exactly once
    val bins = packed.groupBy("bin").agg(sum("n_tokens").as("fill"),
      count(lit(1)).as("n"))
    // no bin over budget unless it is a single over-budget doc
    assert(bins.filter(col("fill") > budget && col("n") > 1).isEmpty)
    // utilization: average fill of multi-doc bins beats half the budget
    val avgFill = bins.filter(col("n") > 1)
      .agg(avg("fill")).head().getDouble(0)
    assert(avgFill > budget / 2.0)
  }
}
