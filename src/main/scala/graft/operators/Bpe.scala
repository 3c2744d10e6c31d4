package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge TRAINING — the tokenizer-construction step of
  * a training-data pipeline (the counting-side complement of
  * [[TextFunctions]]' BPE-ish piece estimator). Classic algorithm: every
  * word starts as its character sequence; k times, count adjacent symbol
  * pairs across the corpus weighted by word frequency, merge the most
  * frequent pair everywhere (greedy left-to-right within a word), emit
  * the merge table — which IS the trained tokenizer artifact.
  *
  * Scale shape — the industrial trainer structure, distributed: the
  * corpus is touched ONCE (token explode → word-frequency aggregate);
  * every iteration thereafter runs on the WORD-COUNT frame (distinct
  * vocabulary, millions of rows at 100 TB — not the corpus), exactly how
  * single-node BPE trainers operate on the word→freq map, except the map
  * itself is a distributed frame. Per iteration: one pair-explode +
  * hash aggregate (pair-cardinality shuffle), a 1-row argmax collect,
  * and a pure-expression fold applying the merge (no UDF); the frame is
  * checkpointed per iteration to keep lineage flat. Driver state is the
  * k-row merge table.
  *
  * Determinism: argmax tie-break is (count desc, left asc, right asc) —
  * a total order, so the merge sequence is a pure function of the
  * corpus. No oracle: k chained data-dependent argmaxes have no sane
  * single-SQL replay; BpeSpec gates the hand-computable fixture, the
  * non-increasing-count invariant, and merge-table closure instead.
  */
object Bpe {

  /** Corpus → (word, freq): the ONE corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Train up to `k` merges over a (word, freq) frame; stops early when
    * no pair repeats. Returns (rank, left, right, merged, pair_count).
    */
  def train(words: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = words.sparkSession
    import spark.implicits._
    // (?!^) splits before every char but the first → character symbols;
    // Spark's split keeps a trailing empty match — drop it
    var cur = words
      .select(col("freq"),
        org.apache.spark.sql.functions.filter(
          split(col("w"), "(?!^)"), s => s =!= "").as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val adj = transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))
      val best = cur
        .select(col("freq"), explode(when(size(col("syms")) >= 2, adj)
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .filter(col("c") >= 2) // a pair seen once is not worth a merge
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      best.headOption match {
        case None => done = true
        case Some(Row(l: String, r: String, c: Long)) =>
          merges += ((rank, l, r, l + r, c))
          // greedy left-to-right application as a pure-expression fold:
          // append each symbol unless it completes (l, r) at the tail
          val applied = aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, s) => when(size(acc) > 0 &&
              element_at(acc, -1) === l && s === r,
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(s))))
          cur = cur.withColumn("syms", applied).localCheckpoint(true)
          rank += 1
      }
    }
    merges.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** End-to-end: corpus → word counts → k merges. */
  def trainOnCorpus(docs: DataFrame, textCol: String, k: Int): DataFrame =
    train(wordCounts(docs, textCol), k)
}
