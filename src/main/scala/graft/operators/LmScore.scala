package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Language-model quality scoring — the CCNet-style filter: train a tiny
  * n-gram LM on a REFERENCE corpus (curated text), score every candidate
  * document by its average log-likelihood under that model, and gate or
  * bucket on the score. Gibberish, boilerplate, and wrong-language text
  * score far below fluent prose; it is the classic statistical stand-in
  * for a neural perplexity filter and needs nothing but counts.
  *
  * Model: word-bigram with add-one smoothing,
  *   P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V),
  * V = reference vocabulary size. Scores are per-doc mean log₂ P over the
  * doc's bigrams (length-normalized, so long docs aren't penalized);
  * unseen bigrams and unseen heads degrade smoothly via the smoothing —
  * never a log(0).
  *
  * Scale shape: the model IS two count aggregates over the reference
  * (bigram counts + head counts — shuffles sized by the reference
  * vocabulary, not the corpus). Scoring is one explode of the candidate
  * docs' bigrams, two equi-joins against the count tables (AQE broadcasts
  * them when the reference is small; at web scale they shuffle-join,
  * still vocabulary-sized), and one per-doc hash agg. Every count is an
  * exact integer; the ONLY float work is the final log/divide per bigram
  * and the per-doc sum, so replays agree to float-association noise
  * (round the published score).
  */
object LmScore {

  /** Per-document mean log₂ bigram likelihood under the reference model:
    * (idCol, n_bigrams, score). Docs with < 2 tokens have no bigrams and
    * are absent from the output (nothing to judge — callers wanting them
    * back left-join on the id).
    */
  def bigramLogLikelihood(docs: DataFrame, reference: DataFrame,
                          textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    def bigrams(df: DataFrame, cols: Seq[String]) = df
      .select(cols.map(col) :+ TextFunctions.ngrams(toks, 2).as("bg"): _*)
      .select(cols.map(col) :+ explode(col("bg")).as("bg"): _*)

    val refBg = bigrams(reference, Nil)
      .groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val refHead = bigrams(reference, Nil)
      .select(split(col("bg"), " ").getItem(0).as("head"))
      .groupBy("head").agg(count(lit(1)).as("c_head"))
    val vocab = reference.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("v"))

    bigrams(docs, Seq(idCol))
      .withColumn("head", split(col("bg"), " ").getItem(0))
      .join(refBg, Seq("bg"), "left")
      .join(refHead, Seq("head"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        (log2(coalesce(col("c_bg"), lit(0L)) + lit(1L)) -
          log2(coalesce(col("c_head"), lit(0L)) + col("v"))).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")) / count(lit(1))).as("score"))
  }
}
