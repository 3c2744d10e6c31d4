package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** WITHIN-document repetition metrics — the Gopher/MassiveText quality
  * rules (Rae et al. 2021, table A1) that every production pretraining
  * pipeline thresholds on, and the in-document complement of
  * [[RepeatedSpans]]' cross-document span detection: a doc that endlessly
  * restates its own n-grams (keyword stuffing, template spam, scraper
  * loops) is low-quality even when no OTHER document shares the text.
  *
  * Two families, both defined on whitespace tokens with character mass
  * measured as the sum of token lengths (whitespace excluded) so the
  * numerator and denominator live in the same integer space on both
  * engines:
  *
  *  - '''top n-gram fraction''' (n = 2, 3, 4 in Gopher): characters
  *    claimed by the single most frequent word n-gram, counted once per
  *    occurrence (overlapping occurrences each count — the published
  *    rule's convention), over total token characters.
  *  - '''duplicate n-gram fraction''' (n = 5..10 in Gopher): characters
  *    covered by ANY within-doc n-gram occurring at least twice, counted
  *    via position-set union so overlapping duplicated grams never
  *    double-count — the interval-coverage semantics, not the naive
  *    per-occurrence sum.
  *
  * Scale shape: positioned grams explode MAP-SIDE; every aggregate keys
  * on (doc_id, …) so partial aggregation combines before the shuffle and
  * no partition ever exceeds document grain. The per-doc char total rides
  * the grouping key (constant per doc — zero extra cardinality) instead
  * of a join. The only windows are partitioned BY doc — doc-sized state,
  * never corpus-sized. All counts are exact integers; the one division
  * per row happens after rounding-stable integer arithmetic, so the
  * DuckDB oracle replays bit-for-bit.
  */
object Repetition {

  /** Per-(doc, n) most-frequent-n-gram stats for each n in `ns`:
    * (doc_id, n, top_gram, top_count, gram_chars, top_frac). Ties break
    * to the lexicographically smallest gram. Documents shorter than n
    * tokens are absent for that n (no gram exists — a filter, not a
    * zero-fill, mirroring Gopher which only scores docs long enough).
    * One corpus scan covers every n: the per-n positioned explodes are
    * flattened inside the row before the single explode.
    */
  /** The shared one-tokenize-pass base frame: (doc_id, _tk, n_tokens,
    * total_chars). Checkpointed so BOTH Gopher families (and all their
    * internal consumers) reuse one corpus scan + split — at 100 TB the
    * tokenize is the dominant cost and must be paid once, not per rule.
    */
  def gopherBase(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    SharedPass.materialize(tokBase(docs, textCol, idCol))

  private def tokBase(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame = {
    // the tokenize is the dominant map-side CPU of both Gopher families:
    // fan the projected (id, text) out of an under-parallel scan before
    // it (no-op at scale — guide §2.5; see ScanParallel)
    val spread = ScanParallel.fanOut(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("_rp_t")),
      Seq(col("doc_id")))
    val toks = TextFunctions.tokens(col("_rp_t"))
    spread.select(col("doc_id"), toks.as("_tk"),
      size(toks).cast("long").as("n_tokens"),
      TextFunctions.tokenLenSum(toks).cast("long").as("total_chars"))
  }

  def topNgramFractions(docs: DataFrame, textCol: String, idCol: String,
                        ns: Seq[Int]): DataFrame =
    topFromBase(tokBase(docs, textCol, idCol), ns)

  /** [[topNgramFractions]] over a prepared [[gopherBase]] frame. */
  def topFromBase(base0: DataFrame, ns: Seq[Int]): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 2), "n-gram orders must be >= 2")
    val base = base0.select(col("doc_id"), col("_tk"),
      col("total_chars").as("_tchars"))
    val nsArr = array(ns.map(n => lit(n)): _*)
    // per n: grams at every start; sequence() descends when start > stop,
    // so short docs guard to an empty array rather than a reversed range
    val posed = base.select(col("doc_id"), col("_tchars"),
      explode(flatten(transform(nsArr, n => {
        val cnt = size(col("_tk")) - (n - 1)
        when(cnt >= 1, transform(sequence(lit(1), cnt), i =>
          struct(n.as("n"),
            array_join(slice(col("_tk"), i, n), " ").as("g"))))
          .otherwise(array().cast("array<struct<n:int,g:string>>"))
      }))).as("e"))
      .select(col("doc_id"), col("_tchars"),
        col("e.n").as("n"), col("e.g").as("g"))
    posed.groupBy("doc_id", "_tchars", "n", "g")
      .agg(count(lit(1)).as("c"))
      // argmax by (count desc, gram asc) as a single min(struct) — no
      // second window pass over the gram frame
      .groupBy("doc_id", "_tchars", "n")
      .agg(min(struct((-col("c")).as("negc"), col("g"))).as("m"))
      .select(col("doc_id"), col("n"), col("m.g").as("top_gram"),
        (-col("m.negc")).as("top_count"),
        (length(col("m.g")) - (col("n") - 1)).cast("long").as("gram_chars"),
        round((-col("m.negc")).cast("double") *
          (length(col("m.g")) - (col("n") - 1)).cast("double") /
          nullif(col("_tchars").cast("double"), lit(0.0)), 6).as("top_frac"))
  }

  /** Per-doc duplicated-n-gram character coverage: (doc_id, n_tokens,
    * total_chars, covered_chars, dup_frac). A token position is covered
    * when any n-gram occurrence containing it has a within-doc twin;
    * covered_chars sums the lengths of covered tokens once each. Keeps
    * every document (zero coverage reports 0 / 0.0).
    */
  def dupNgramCoverage(docs: DataFrame, textCol: String, idCol: String,
                       n: Int): DataFrame =
    // three consumers (positioned grams, per-position lengths, the final
    // doc-grain join) — materialize the tokenize once instead of
    // re-scanning and re-splitting the corpus per consumer, the same
    // checkpointed-pass discipline as RepeatedSpans/CorpusPipeline
    dupFromBase(gopherBase(docs, textCol, idCol), n)

  /** [[dupNgramCoverage]] over a prepared [[gopherBase]] frame. */
  def dupFromBase(base: DataFrame, n: Int): DataFrame = {
    require(n >= 2, "duplicate-gram order must be >= 2")
    val cnt = size(col("_tk")) - (n - 1)
    val posed = base.select(col("doc_id"),
      explode(when(cnt >= 1, transform(sequence(lit(1), cnt), i =>
        struct(i.as("pos"),
          md5(array_join(slice(col("_tk"), i, lit(n)), " ")).as("h"))))
        .otherwise(array().cast("array<struct<pos:int,h:string>>"))).as("ps"))
      .select(col("doc_id"), col("ps.pos").as("pos"), col("ps.h").as("h"))
    // within-doc multiplicity as a window over (doc, h): the same shuffle
    // a groupBy would pay, with no join back
    val flagged = posed
      .withColumn("_c", count(lit(1)).over(
        Window.partitionBy("doc_id", "h")))
      .filter(col("_c") >= 2)
    val lens = base.select(col("doc_id"),
      posexplode(col("_tk")).as(Seq("_p0", "_t")))
      .select(col("doc_id"), (col("_p0") + 1).as("tp"),
        length(col("_t")).cast("long").as("_len"))
    val covered = flagged
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tp"))
      .distinct()
      .join(lens, Seq("doc_id", "tp"))
      .groupBy("doc_id").agg(sum(col("_len")).as("covered_chars"))
    base.select(col("doc_id"), col("n_tokens"), col("total_chars"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("total_chars"),
        coalesce(col("covered_chars"), lit(0L)).as("covered_chars"),
        round(coalesce(col("covered_chars"), lit(0L)).cast("double") /
          nullif(col("total_chars").cast("double"), lit(0.0)), 6)
          .as("dup_frac"))
  }
}
