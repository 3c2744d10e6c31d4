package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Interpolated Kneser–Ney bigram scoring — the standard upgrade over
    * add-one: absolute discount `d` on seen bigrams, the freed mass
    * backing off to the CONTINUATION distribution (how many distinct
    * heads precede w₂ — "Francisco" is frequent but follows only "San",
    * so its continuation mass is tiny where a raw-unigram backoff would
    * overrate it):
    *
    *   P(w₂|w₁) = max(c(w₁w₂)−d, 0)/c(w₁·) + d·N₁₊(w₁·)/c(w₁·) · Pc(w₂)
    *   Pc(w₂)   = (N₁₊(·w₂) + 1) / (Nᵗʸᵖᵉˢ + V + 1)   (add-one so OOV
    *              continuations stay finite; exact-rational counts only)
    *
    * and P = Pc alone for unseen heads. Every model quantity is an
    * integer count (bigram types are distinct pairs, so the per-head /
    * per-tail type counts are plain `count(*)` over the count table);
    * floats appear only in the final per-bigram probability and log —
    * the DuckDB replay is exact under round6's sub-ulp policy.
    *
    * Scale shape: identical to [[bigramLogLikelihood]] — the model is
    * three aggregates over the reference (vocabulary-sized, never
    * corpus-sized), scoring is one explode + three equi-joins + one
    * per-doc agg.
    */
  def kneserNeyLogLikelihood(docs: DataFrame, reference: DataFrame,
                             d: Double = 0.75,
                             textCol: String = "text",
                             idCol: String = "doc_id"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    def bigrams(df: DataFrame, cols: Seq[String]) = df
      .select(cols.map(col) :+ TextFunctions.ngrams(toks, 2).as("bg"): _*)
      .select(cols.map(col) :+ explode(col("bg")).as("bg"): _*)

    val refBg = bigrams(reference, Nil)
      .groupBy("bg").agg(count(lit(1)).as("c_bg"))
      .withColumn("head", split(col("bg"), " ").getItem(0))
      .withColumn("tail", split(col("bg"), " ").getItem(1))
    val headStats = refBg.groupBy("head").agg(
      sum(col("c_bg")).as("c_head"), count(lit(1)).as("n1p_head"))
    val contStats = refBg.groupBy(col("tail").as("w2"))
      .agg(count(lit(1)).as("cont"))
    val totals = refBg.agg(count(lit(1)).as("n_types"))
      .crossJoin(reference.select(explode(toks).as("t"))
        .agg(countDistinct(col("t")).as("v")))

    val pc = (coalesce(col("cont"), lit(0L)).cast("double") + lit(1.0)) /
      (col("n_types").cast("double") + col("v").cast("double") + lit(1.0))
    val c1 = coalesce(col("c_head"), lit(0L)).cast("double")
    val c12 = coalesce(col("c_bg"), lit(0L)).cast("double")
    val p = when(c1 > 0.0,
      greatest(c12 - lit(d), lit(0.0)) / c1 +
        lit(d) * coalesce(col("n1p_head"), lit(0L)).cast("double") / c1 * pc)
      .otherwise(pc)

    bigrams(docs, Seq(idCol))
      .withColumn("head", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(refBg.select(col("bg"), col("c_bg")), Seq("bg"), "left")
      .join(headStats, Seq("head"), "left")
      .join(contStats, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol), log2(p).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")) / count(lit(1))).as("score"))
  }

  /** CCNet's bucketing step (Wenzek et al. 2020 §3.3, "language model
    * filtering"): within each group (language), split scored docs into
    * head / middle / tail at the group's score terciles. Higher score =
    * more reference-like, so the top tercile (score ≥ t2) is "head".
    *
    * Scale shape: the thresholds are a GROUP-COUNT-sized model frame —
    * two exact interpolated percentiles per group — broadcast back onto
    * the docs, so assignment is map-side. No per-language ntile window
    * or global sort ever exists, which is what keeps this runnable when
    * one language is 80% of a 100 TB corpus (CCNet itself assigns by
    * threshold for the same reason). Scores must arrive already rounded
    * to 6 dp and thresholds are rounded the same, so the boundary CASE
    * compares identical numbers on both engines.
    *
    * `accuracy` is the scale knob: 0 (default) uses exact interpolated
    * `percentile` — which buffers every score of a group inside one
    * TypedImperativeAggregate buffer, fine up to millions of rows per
    * group and the oracle-gated mode; a positive value swaps in
    * `percentile_approx` at that accuracy (a bounded-size, mergeable
    * KLL-style sketch) — same plan shape, same downstream expression —
    * which is the only memory-safe mode when a dominant language holds
    * billions of scores. ThresholdKnobSpec pins the two modes' bucket
    * assignments in agreement on the test corpus.
    */
  def tercileBuckets(scored: DataFrame, groupCol: String = "lang",
                     scoreCol: String = "score",
                     accuracy: Int = 0): DataFrame = {
    def pct(p: Double): Column =
      if (accuracy > 0)
        percentile_approx(col(scoreCol).cast("double"), lit(p), lit(accuracy))
      else percentile(col(scoreCol), lit(p))
    val th = scored.groupBy(groupCol).agg(
      round(pct(1.0 / 3), 6).as("_t1"),
      round(pct(2.0 / 3), 6).as("_t2"))
    scored.join(broadcast(th), Seq(groupCol))
      .withColumn("bucket",
        when(col(scoreCol) >= col("_t2"), "head")
          .when(col(scoreCol) >= col("_t1"), "middle")
          .otherwise("tail"))
      .drop("_t1", "_t2")
  }
}
