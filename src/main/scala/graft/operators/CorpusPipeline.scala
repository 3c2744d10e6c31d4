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
      .localCheckpoint(true)
    // the drop set is usually small, but "usually" is not a bound — crawl
    // corpora can be 30-50% near-dup, and an unconditional broadcast of an
    // unbounded set OOMs. AQE sees the runtime size and picks broadcast vs
    // shuffled anti-join itself.
    val dropIds = Dedup.ngramJaccardPairs(kept, n = 3, minJaccard = minJaccard)
      .select(col("b").as("doc_id")).distinct()
    kept.join(dropIds, Seq("doc_id"), "left_anti")
      .select("doc_id", "predicted", "quality")
  }
}
