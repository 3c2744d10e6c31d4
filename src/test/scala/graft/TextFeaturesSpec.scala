package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFeaturesFast, TextFunctions}

/** Sync guard: the mapPartitions text-feature pass must be value-identical
  * to the expression forms.
  */
class TextFeaturesSpec extends SparkSpec {

  test("fast langQuality == expression predictedLang/qualityScore") {
    val docs = Tables.documents(spark, sf())
    val toks = TextFunctions.tokens(col("text"))
    val expr = docs.select(col("doc_id"),
      TextFunctions.predictedLang(toks).as("predicted"),
      round(TextFunctions.qualityScore(toks), 6).as("quality"))
    val fast = TextFeaturesFast.langQuality(docs)
      .select(col("doc_id"), col("predicted"),
        round(col("quality_raw"), 6).as("quality"))
    assert(fast.exceptAll(expr).isEmpty && expr.exceptAll(fast).isEmpty)
  }
}
