package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sparse-vector similarity over text: TF-IDF weighted cosine pairs through
  * an inverted index — the lexical near-dup / retrieval primitive that
  * complements the dense-embedding paths in [[Similarity]] (BM25-family
  * retrieval and SimCSE-style hard-negative mining both start here).
  *
  * Scale shape: a document pair is scored ONLY if it co-occurs in some
  * token's posting list, so the candidate space is Σ_token |postings|², not
  * |docs|². Two levers keep that sum bounded at 100 TB:
  *
  *   - `dfCap` drops tokens whose document frequency exceeds the cap BEFORE
  *     the self-join (stop-like tokens carry ~zero IDF weight but quadratic
  *     join cost — dropping them is the standard inverted-index trade, and
  *     it is mirrored exactly in the oracle so both engines score the same
  *     pruned space);
  *   - the self-join is a plain equi-join on token (hash exchange on the
  *     token key), so AQE skew-splitting applies to any residual hot term.
  *
  * Determinism across engines: weights are rounded to 6 dp and cast to
  * DECIMAL(18,6), so the per-pair dot product and per-doc norms are EXACT
  * decimal sums — a grouped float sum would depend on partition order and
  * could flip a pair sitting on the threshold. The final cosine divides two
  * exact decimals in double (same IEEE ops on both engines) and rounds to
  * 6 dp; the threshold cut applies to that rounded value.
  */
object SparseSim {

  /** All document pairs (a < b) with TF-IDF cosine ≥ `minCos`, scored in
    * the `dfCap`-pruned token space. Output: (a, b, shared, cos) where
    * `shared` is the number of co-occurring (surviving) tokens.
    */
  def tfidfCosinePairs(docs: DataFrame, minCos: Double = 0.3,
                       dfCap: Int = 100): DataFrame = {
    require(minCos > 0, "minCos must be positive")
    require(dfCap >= 1, "dfCap must be >= 1")
    val tok = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col("text"))).as("token"))
    val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // document frequency per token; the cap prunes hot (stop-like) tokens
    // before they can enter the quadratic posting-list self-join
    val dfr = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val n = docs.agg(count(lit(1)).as("n"))
    // 6-dp-rounded weight as exact decimal: every downstream sum is
    // order-independent, so Spark and the oracle agree bit-for-bit.
    // Materialized ONCE — it feeds the norms and BOTH posting-list join
    // sides, and without the checkpoint Catalyst re-derives the whole
    // tokenize→tf→df pipeline per consumer (2× the scan work at scale)
    val w = tf.join(dfr, "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6)
          .cast("decimal(18,6)").as("w"))
      .localCheckpoint(true)
    val nrm = w.groupBy("doc_id").agg(sum(col("w") * col("w")).as("n2"))
    val x = w.select(col("doc_id").as("a"), col("token"), col("w").as("wa"))
    val y = w.select(col("doc_id").as("b"), col("token"), col("w").as("wb"))
    val dots = x.join(y, Seq("token")).filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(sum(col("wa") * col("wb")).as("dot"),
        count(lit(1)).as("shared"))
    val na = nrm.select(col("doc_id").as("a"), col("n2").as("na2"))
    val nb = nrm.select(col("doc_id").as("b"), col("n2").as("nb2"))
    dots.join(na, "a").join(nb, "b")
      .select(col("a"), col("b"), col("shared"),
        round(col("dot").cast("double") /
          nullif(sqrt(col("na2").cast("double")) *
            sqrt(col("nb2").cast("double")), lit(0.0)), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
