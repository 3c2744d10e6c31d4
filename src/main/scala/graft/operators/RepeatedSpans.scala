package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Cross-document repeated SPAN detection — the span-level half of the
  * dedup family (cf. Lee et al., "Deduplicating Training Data Makes
  * Language Models Better"): whole-doc near-dup (MinHash/SimHash/Jaccard
  * operators in [[Dedup]]) misses the boilerplate paragraph pasted into
  * thousands of otherwise-unique documents, which is exactly the text a
  * language model memorizes. A span here is a word n-gram whose text
  * occurs at least `minCount` times across the corpus; per document we
  * report how many MERGED repeated regions it contains and what fraction
  * of its tokens they cover — the rank/removal signal a curation
  * pipeline thresholds on.
  *
  * Scale shape: positioned shingles explode MAP-SIDE (one row per token,
  * same mass as the dedup shingle index); the global multiplicity is ONE
  * hash aggregate on the shingle's md5 (128-bit — no collision flags at
  * corpus scale); flagged positions come back via an equi-join on that
  * hash (AQE-sized, never a cross product). Span merging and coverage
  * run per-document: a lag window partitioned BY doc (doc-sized
  * partitions, never data-sized) and a bounded n-fold position explode.
  * The tokenization pass is scanned twice (index + per-doc stats) rather
  * than checkpointing a data-sized token frame.
  */
object RepeatedSpans {

  /** Per-document repeated-span statistics: (doc_id, n_tokens,
    * n_flagged (positioned shingles in a repeated class), n_spans
    * (merged regions), covered_tokens, repeated_frac). Documents with no
    * repeated span report zeros — the frame keeps EVERY document, so a
    * downstream filter sees the clean ones too.
    */
  def spanStats(docs: DataFrame, textCol: String, idCol: String,
                n: Int, minCount: Int): DataFrame = {
    require(n >= 2, "span width must be >= 2 tokens")
    require(minCount >= 2, "a span repeats only at multiplicity >= 2")
    val toks = TextFunctions.tokens(col(textCol))
    val base = docs.select(col(idCol).as("doc_id"), toks.as("_tk"))
    val cnt = size(col("_tk")) - (n - 1)
    val posed = base
      .select(col("doc_id"), explode(when(cnt >= 1,
        transform(sequence(lit(1), cnt), i =>
          struct(i.as("pos"),
            md5(array_join(slice(col("_tk"), i, lit(n)), " ")).as("h"))))
        .otherwise(array().cast("array<struct<pos:int,h:string>>"))).as("ps"))
      .select(col("doc_id"), col("ps.pos").as("pos"), col("ps.h").as("h"))
      // the positioned index feeds BOTH the multiplicity aggregate and
      // the flag join — materialize the tokenize+explode once (the same
      // checkpointed-shingle-pass discipline as CorpusPipeline) instead
      // of re-scanning and re-shingling the corpus
      .transform(SharedPass.materialize)
    val repeated = posed.groupBy("h")
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= minCount)
      .select("h")
    val flagged = posed.join(repeated, "h")
    val covered = flagged
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("_tp"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered_tokens"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val newSpan = when(lag(col("pos"), 1).over(w).isNull ||
      col("pos") > lag(col("pos"), 1).over(w) + n, 1L).otherwise(0L)
    val spans = flagged
      .withColumn("_new", newSpan)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_flagged"), sum(col("_new")).as("n_spans"))
    base.select(col("doc_id"), size(col("_tk")).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)).cast("double") /
          nullif(col("n_tokens").cast("double"), lit(0.0)), 6)
          .as("repeated_frac"))
  }
}
