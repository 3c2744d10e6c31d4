package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution: find records that are the same real-world entity
  * under typos/variants — the blocking → pairwise-verify → cluster
  * pipeline every record-linkage system runs. [[Dedup]] answers "same
  * TEXT?" with set similarity; this answers "same ENTITY?" with edit
  * distance on a key field, and [[Components]] turns the match pairs into
  * transitive clusters.
  *
  * Scale shape: all-pairs edit distance is O(n²) and never runs — the
  * caller's `blockKey` (phonetic code, name prefix, zip, …) turns it into
  * an equi-join where only same-block records compare. Block sizes bound
  * the quadratic; a deterministic per-block cap (first-K by id) guards
  * the degenerate hot block (everything keyed "UNKNOWN"), biasing matches
  * LOW for over-capacity blocks — same honesty contract as the caps in
  * [[Dedup]]/[[Cooccurrence]], and any replay must mirror it. The
  * levenshtein verify is codegen'd and runs only inside blocks.
  */
object EntityResolution {

  /** (a, b, dist) for same-block record pairs with
    * levenshtein(name_a, name_b) <= maxDist, a < b on the id.
    */
  def fuzzyPairs(records: DataFrame, idCol: String, nameCol: String,
                 blockKey: Column, maxDist: Int,
                 maxBlockSize: Int = 1000): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(maxBlockSize >= 2, "maxBlockSize must be >= 2")
    val keyed = records
      .select(col(idCol).as("id"), col(nameCol).as("nm"), blockKey.as("bk"))
      .filter(col("bk").isNotNull)
    // the block cap exists BECAUSE blocks skew (a hot soundex/prefix key
    // can hold a large share of the records) — so the rank computing it
    // must not itself funnel the hot block through one window task.
    // Numeric AND string/binary ids (UUIDs, 'cust-123') route through
    // SkewedRank's two-phase bucketed rank; only types without a
    // monotone bucket image keep the classic window, so the public API
    // stays type-agnostic as it always was
    val capped =
      if (SkewedRank.supports(keyed.schema("id").dataType))
        SkewedRank.rowNumber(keyed, "bk", "id", rankCol = "rn")
          .filter(col("rn") <= maxBlockSize).drop("rn")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("bk").orderBy("id")
        keyed.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= maxBlockSize).drop("rn")
      }
    capped.alias("x")
      .join(capped.alias("y"),
        col("x.bk") === col("y.bk") && col("x.id") < col("y.id"))
      .withColumn("dist", levenshtein(col("x.nm"), col("y.nm")))
      .filter(col("dist") <= maxDist)
      .select(col("x.id").as("a"), col("y.id").as("b"), col("dist"))
  }

  /** Full resolution: every record labeled with its entity cluster (the
    * min id reachable through fuzzy matches; unmatched records cluster
    * alone).
    */
  def resolve(records: DataFrame, idCol: String, nameCol: String,
              blockKey: Column, maxDist: Int,
              maxBlockSize: Int = 1000): DataFrame =
    Components.clusters(records,
      fuzzyPairs(records, idCol, nameCol, blockKey, maxDist, maxBlockSize)
        .select("a", "b"),
      idCol)
}
