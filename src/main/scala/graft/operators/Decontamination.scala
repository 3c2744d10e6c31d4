package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene pass that keeps
  * evaluation sets out of the training corpus: a corpus document is
  * contaminated when it shares at least `minOverlap` DISTINCT word n-gram
  * shingles with some eval document (the industry-standard n-gram-overlap
  * test; n=13 is the common production choice, configurable here because
  * the fixture docs are short).
  *
  * Scale shape: one shingling pass per side ([[Dedup.shingleSets]] — the
  * corpus side is the big one, the eval set is benchmarks, i.e. tiny), then
  * an inverted-index equi-join on the shingle with the eval side explicitly
  * `broadcast()` — corpus shingles stream map-side against the broadcast
  * hash relation, so there is NO shuffle of the corpus and never a cross
  * product. Overlap counting is one hash aggregate on (doc_id, eval_id).
  * At 100 TB the corpus side stays embarrassingly parallel; only the
  * flagged-pair set (bounded by contamination, not corpus size) moves.
  */
object Decontamination {

  /** (doc_id, eval_id, overlap) for every corpus×eval pair sharing at least
    * `minOverlap` distinct n-gram shingles. `eval` must be small enough to
    * broadcast (it is the benchmark set).
    */
  def contaminatedPairs(corpus: DataFrame, eval: DataFrame, n: Int,
                        minOverlap: Int,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    val c = Dedup.shingleSets(corpus, n, textCol, idCol)
      .select(col("doc_id"), explode(col("sh")).as("sg"))
    val e = Dedup.shingleSets(eval, n, textCol, idCol)
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("sg"))
    c.join(broadcast(e), "sg")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** The corpus with contaminated documents removed (anti-join on the
    * flagged ids — a broadcast anti-join at benchmark-set scale).
    */
  def decontaminate(corpus: DataFrame, eval: DataFrame, n: Int,
                    minOverlap: Int,
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val flagged = contaminatedPairs(corpus, eval, n, minOverlap,
      textCol, idCol).select(col("doc_id").as(idCol)).distinct()
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }

  /** [[contaminatedPairs]] for the BIG-eval regime: when the eval side is
    * too large to broadcast as an exact hash relation (a full benchmark
    * UNION or a held-out split, not one benchmark), the join becomes a
    * corpus-sized shuffle — unless almost all corpus shingles can be
    * discarded first. A Bloom filter over the eval shingle hashes is ~10×
    * smaller than the hash relation at the same membership question
    * (1.2 bytes/item at 1% fpp), so it still fits in every task where the
    * exact relation no longer does; corpus shingles that miss it (the
    * overwhelming majority — contamination is rare by construction) drop
    * map-side BEFORE the shuffle, which then carries only candidate
    * shingles. False positives cost a wasted shuffle row, never a wrong
    * answer: the equi-join after the filter verifies exactly, so the
    * result is IDENTICAL to [[contaminatedPairs]] (DeconBloomSpec pins
    * frame equality; the sketch is built distributed via `stat
    * .bloomFilter`'s treeAggregate and ships to tasks as a plan literal).
    */
  def contaminatedPairsBloom(corpus: DataFrame, eval: DataFrame, n: Int,
                             minOverlap: Int, fpp: Double = 0.01,
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame = {
    require(minOverlap >= 1, "minOverlap must be >= 1")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val c = Dedup.shingleSets(corpus, n, textCol, idCol)
      .select(col("doc_id"), explode(col("sh")).as("sg"))
    // materialized once: feeds the bloom build AND the verify join
    val e = Dedup.shingleSets(eval, n, textCol, idCol)
      .select(col("doc_id").as("eval_id"), explode(col("sh")).as("sg"))
      .localCheckpoint()
    val hashes = e.select(xxhash64(col("sg")).as("h"))
    val nItems = math.max(hashes.count(), 64L)
    val bf = hashes.stat.bloomFilter("h", nItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val probe = org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal
          .create(bytes, org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftColumnBridge.expression(
          xxhash64(col("sg")))))
    c.filter(probe).join(e, "sg")
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }
}
