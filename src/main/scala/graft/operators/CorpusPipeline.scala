package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline the extension operators
  * exist for: language filter → quality filter → near-duplicate removal.
  *
  * Composition, not new machinery — each stage is one of the engine's
  * oracled operators:
  *   1. keep docs whose predicted language is in `keepLangs`
  *      ([[TextFunctions.predictedLang]]);
  *   2. keep docs with quality ≥ `minQuality`
  *      ([[TextFunctions.qualityScore]]);
  *   3. drop the higher-id side of every n-gram-Jaccard near-dup pair ≥
  *      `minJaccard` ([[Dedup.ngramJaccardPairs]]) — the deterministic
  *      keep-first policy (matches [[Dedup.exact]]'s keep-min rule).
  *
  * Shuffle profile at 100 TB: stages 1-2 are pure map-side expression
  * filters fused into the scan; stage 3 is the inverted-index candidate
  * join over ALREADY-filtered survivors — filter before dedup, always.
  */
object CorpusPipeline {

  def clean(docs: DataFrame,
            keepLangs: Seq[String] = Seq("en"),
            minQuality: Double = 0.28,
            minJaccard: Double = 0.5): DataFrame = {
    // survivors feed the shingle index AND the final anti-join: one
    // materialized lang+quality pass instead of two
    val kept = graft.functions.TextFeaturesFast.langQuality(docs)
      .withColumn("quality", round(col("quality_raw"), 6))
      .drop("quality_raw")
      .filter(col("predicted").isin(keepLangs: _*) &&
        col("quality") >= minQuality)
      .transform(SharedPass.materialize)
    // the drop set is usually small, but "usually" is not a bound — crawl
    // corpora can be 30-50% near-dup, and an unconditional broadcast of an
    // unbounded set OOMs. AQE sees the runtime size and picks broadcast vs
    // shuffled anti-join itself.
    val dropIds = Dedup.ngramJaccardPairs(kept, n = 3, minJaccard = minJaccard)
      .select(col("b").as("doc_id")).distinct()
    kept.join(dropIds, Seq("doc_id"), "left_anti")
      .select("doc_id", "predicted", "quality")
  }

  /** The attrition funnel for [[clean]]: docs and tokens surviving each
    * successive stage (raw → lang → quality → near_dup), one row per
    * stage. Per-doc stage-reached comes from the same operators clean
    * executes (near-dup drops among quality survivors only — filter
    * before dedup); the 4 rows form in ONE aggregation via a
    * literal-stage explode (4× map-side amplification, no window, no
    * second scan). Shared by `corpus_filter_funnel` and the CLI `corpus`
    * verb so the report can never drift from the pipeline it reports on.
    */
  def filterFunnel(docs: DataFrame,
                   keepLangs: Seq[String] = Seq("en"),
                   minQuality: Double = 0.28,
                   minJaccard: Double = 0.5): DataFrame = {
    import graft.functions.{TextFeaturesFast, TextFunctions}
    val flagged = TextFeaturesFast.langQuality(docs)
      .withColumn("quality", round(col("quality_raw"), 6))
      .withColumn("n_toks",
        TextFunctions.tokenCount(TextFunctions.tokens(col("text")))
          .cast("long"))
      .withColumn("pass_lang", col("predicted").isin(keepLangs: _*))
      .withColumn("pass_quality",
        col("pass_lang") && col("quality") >= minQuality)
      .transform(SharedPass.materialize) // feeds the dedup index AND the funnel
    val drops = Dedup.ngramJaccardPairs(
        flagged.filter(col("pass_quality")), n = 3, minJaccard = minJaccard)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("_dropped", lit(true))
    flagged.join(drops, Seq("doc_id"), "left")
      .withColumn("sr",
        when(!col("pass_lang"), 0)
          .when(!col("pass_quality"), 1)
          .when(coalesce(col("_dropped"), lit(false)), 2)
          .otherwise(3))
      .select(col("sr"), col("n_toks"),
        explode(typedLit(Seq(0, 1, 2, 3))).as("stage"))
      .filter(col("sr") >= col("stage"))
      .groupBy("stage")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("stage_name", element_at(
        typedLit(Seq("raw", "lang", "quality", "near_dup")),
        col("stage") + 1))
      .select(col("stage").cast("long").as("stage"),
        col("stage_name"), col("n_docs"), col("n_tokens"))
  }

  /** Canonical-representative selection: map EVERY document to the best
    * copy in its near-dup cluster — clusters from connected components
    * over the Jaccard pair graph, representative = highest quality score,
    * doc_id ascending on ties (fully deterministic). This is the curation
    * step [[clean]]'s keep-first policy approximates: keep-first keeps the
    * OLDEST copy; canonicalize keeps the BEST and gives the full
    * old→canonical mapping (what a dedup run must publish so downstream
    * references can be rewritten).
    *
    * Shuffle profile: pair join + O(log n) component rounds (both bounded
    * by [[Dedup]]'s inverted index), a max_by hash aggregate for the
    * per-cluster argmax (partial-combines map-side, so even a giant
    * near-dup cluster never funnels one task — no window), and a
    * representative join back (reps frame is ≤ one row per cluster; AQE
    * broadcasts it).
    */
  def canonicalize(docs: DataFrame, minJaccard: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = minJaccard)
      .select("a", "b")
    val clusters = Components.clusters(docs, pairs) // (doc_id, cluster_id)
    val quality = docs.select(col("doc_id"),
      round(TextFunctions.qualityScore(TextFunctions.tokens(col("text"))), 6)
        .as("quality"))
    // argmax by (quality desc, doc_id asc) as a min_by HASH AGGREGATE —
    // never a per-cluster window: a giant near-dup cluster (boilerplate
    // repeated millions of times) would funnel one window task, while
    // the aggregate partial-combines its winner map-side. Lexicographic
    // struct order gives the tie rule: min(-quality) = MAX quality, then
    // MIN doc_id — only quality (a double) is negated, so string/UUID
    // doc_ids keep their NATIVE ordering (negating the id would cast it
    // to null under non-ANSI and make quality ties nondeterministic).
    val reps = clusters.join(quality, "doc_id")
      .groupBy("cluster_id")
      .agg(min_by(col("doc_id"),
        struct((-col("quality")).as("_nq"), col("doc_id")))
        .as("canonical_id"))
    clusters.join(reps, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"))
  }

  /** Corpus-level boilerplate scoring: an n-gram shingle held by more than
    * `maxDocFrac` of all documents is boilerplate (headers, footers,
    * license blurbs — content that repeats ACROSS documents, which
    * within-doc repetition signals like `text_repetition` cannot see);
    * each document scores the fraction of its distinct shingles that are
    * boilerplate. Emits one row per document with ≥ n tokens:
    * (doc_id, n_shingles, n_boiler, boiler_ratio).
    *
    * Shuffle profile at 100 TB: ONE shingling pass (checkpointed — the
    * exploded frame feeds both the document-frequency aggregate and the
    * per-doc count), document frequency is a map-side-combining count on
    * the shingle key, and the hot set joins back as a semi-join AQE sizes
    * itself (it is df-capped by definition: |hot| ≤ total shingle mass /
    * (maxDocFrac · N) — the threshold bounds its own candidate set).
    */
  def boilerplate(docs: DataFrame, n: Int = 3,
                  maxDocFrac: Double = 0.3): DataFrame = {
    require(maxDocFrac > 0.0 && maxDocFrac <= 1.0,
      "maxDocFrac must be in (0, 1]")
    val sh = SharedPass.materialize(Dedup.shingleSets(docs, n))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("sg"))
    // shingles are distinct per doc, so count(*) per shingle IS its
    // document frequency; the one-row total crossJoin is a literal-sized
    // broadcast, not a data join
    val total = docs.select(count(lit(1)).cast("double").as("n_docs"))
    val hot = ex.groupBy("sg").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(total))
      .filter(col("df") > col("n_docs") * maxDocFrac)
      .select("sg")
    val perDoc = ex.join(hot, Seq("sg"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
    sh.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        round(coalesce(col("n_boiler"), lit(0L)) / col("n_shingles"), 6)
          .as("boiler_ratio"))
  }
}
