package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection by importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much more likely its HASHED n-gram features
  * are under a small target distribution than under the raw-corpus
  * distribution, then keep the importance head — the standard recipe for
  * steering a web-scale corpus toward a curated target (quality books /
  * wiki / in-domain text) without training a classifier.
  *
  * This implementation uses hashed UNIGRAM features (the paper's hashed
  * n-gram estimator with n = 1): token → md5-prefix bucket in [0, B),
  * add-one-smoothed bucket distributions p_target / p_raw, and per-doc
  * importance log w(x) = Σ_tokens log(p_t(b)/p_r(b)), computed as
  * Σ_buckets n_db · (log p_t(b) − log p_r(b)) from exact integer counts.
  *
  * Scale shape: ONE token pass → (doc, bucket) counts (map-side
  * combining; bucket cardinality is B, fixed); the two distributions are
  * B-row aggregates of that same frame (broadcast-sized model state, like
  * a vocabulary dictionary); scoring is an equi-join of doc-bucket counts
  * against the B-row ratio frame + one per-doc aggregate. The corpus is
  * never shuffled on a data-sized key and the model is O(B) — the paper's
  * own motivation for hashing.
  *
  * Determinism: buckets are md5-derived (engine-reproducible, the
  * [[Sampling]] discipline); counts are exact integers; the only floats
  * are the per-bucket log terms, summed per doc under the round6 policy
  * (the [[graft.queries.TextQueries]] text_entropy precedent), and the
  * selection ranks on the ROUNDED weight with a doc_id tie-break, so the
  * top-k boundary is stable across engines. A sampled (rather than
  * top-k) variant is one exponential-race key away — the X107 k-means++
  * machinery — but selection-by-head is what keeps the whole query
  * hash-gateable.
  */
object Dsir {

  /** md5-prefix hash bucket in [0, B) — 15 hex digits < 2^60, exact in a
    * long; replayed in DuckDB as ('0x' || substring(md5(t),1,15))::BIGINT.
    */
  def bucketOf(tok: Column, b: Int): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"), lit(b))

  /** Per-document importance log-weights against a target subset.
    * Returns (idCol, n_tokens, log_weight) for EVERY document (target
    * docs score too — selection happens downstream; a zero-token doc
    * carries the empty-sum values n_tokens 0, log_weight 0.0).
    * `targetPred` marks the target subset (rows must satisfy it in
    * `docs`).
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
                        targetPred: Column, b: Int = 256): DataFrame = {
    require(b >= 2, "need at least 2 hash buckets")
    val spark = docs.sparkSession
    val toks = docs
      .select(col(idCol), targetPred.as("_is_target"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(col(idCol), col("_is_target"), bucketOf(col("_tok"), b).as("_b"))
    val docBuckets = toks.groupBy(col(idCol), col("_b"))
      .agg(count(lit(1)).as("_n"), first(col("_is_target")).as("_is_target"))
      .localCheckpoint(false) // feeds both distributions and the scoring join
    // B-row distributions from exact integer counts (missing buckets = 0)
    val byBucket = docBuckets.groupBy("_b").agg(
      sum(when(col("_is_target"), col("_n")).otherwise(0L)).as("_ct"),
      sum(col("_n")).as("_cr"))
    val totals = byBucket.agg(
      sum(col("_ct")).as("_nt"), sum(col("_cr")).as("_nr")).head()
    val (nt, nr) = (totals.getLong(0), totals.getLong(1))
    val ratio = spark.range(b).select(col("id").as("_b"))
      .join(byBucket, Seq("_b"), "left")
      .select(col("_b"),
        (log((coalesce(col("_ct"), lit(0L)) + 1).cast("double") /
          lit((nt + b).toDouble)) -
          log((coalesce(col("_cr"), lit(0L)) + 1).cast("double") /
            lit((nr + b).toDouble))).as("_logratio"))
    val weighted = docBuckets.join(broadcast(ratio), Seq("_b"))
      .groupBy(col(idCol))
      .agg(sum(col("_n")).as("n_tokens"),
        round(sum(col("_n").cast("double") * col("_logratio")), 6)
          .as("log_weight"))
    // zero-token docs fall out of the explode above; keep the "EVERY
    // document" contract by joining back with the empty-sum values
    // (n_tokens 0, log_weight 0.0). Id-equi-join, same shuffle key as
    // the aggregate — no new shuffle shape.
    docs.select(col(idCol)).join(weighted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("log_weight"), lit(0.0)).as("log_weight"))
  }

  /** DSIR's SAMPLED selection (the paper's actual resampling step, vs
    * [[selectOracleSql]]'s deterministic head): Gumbel-top-k — rank on
    * log_weight + g where g = −ln(−ln u) is Gumbel noise from the seeded
    * md5 coin, take the top k. Equivalent to sampling k docs WITHOUT
    * replacement ∝ softmax(log_weight) (the Gumbel-max trick), but a
    * pure function of (seed, id, weights): partition-invariant,
    * replayable, and free of the u^(1/w) overflow the plain A-ES key
    * hits when exp(log_weight) leaves double range. Key rounds to 6 dp
    * with an id tiebreak so the cut replays engine-identically.
    */
  def gumbelTopK(weights: DataFrame, seed: String, k: Int,
                 idCol: String = "doc_id"): DataFrame = {
    val u = Sampling.uniformDraw(
      concat_ws(":", lit(seed), col(idCol).cast("string")))
    val key = round(col("log_weight") - log(-log(u)), 6)
    // distributed top-k (per-partition heaps), then rank ONLY the k
    // survivors — never a corpus-sized unpartitioned window
    val top = weights.withColumn("_gk", key)
      .orderBy(col("_gk").desc, col(idCol).asc).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_gk").desc, col(idCol).asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .drop("_gk")
  }

  /** The weights CTE chain shared by both oracle replays: emits
    * `w(doc_id, n_tokens, log_weight)` (rounded 6 dp) over `documents`.
    */
  private def weightsCtes(targetPredSql: String, b: Int,
                          toksSql: String): String =
    s"""tok0 AS (
       |  SELECT doc_id, ($targetPredSql) AS is_target,
       |         unnest($toksSql) AS tk
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, is_target,
       |         ('0x' || substring(md5(tk), 1, 15))::BIGINT % $b AS b
       |  FROM tok0),
       |db AS (SELECT doc_id, b, any_value(is_target) AS is_target,
       |              count(*) AS n
       |       FROM tok GROUP BY 1, 2),
       |bb AS (SELECT b,
       |              sum(CASE WHEN is_target THEN n ELSE 0 END) AS ct,
       |              sum(n) AS cr
       |       FROM db GROUP BY 1),
       |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
       |               CAST(sum(cr) AS BIGINT) AS nr FROM bb),
       |ratio AS (
       |  SELECT r.range AS b,
       |         ln(CAST(coalesce(bb.ct, 0) + 1 AS DOUBLE)
       |            / CAST((SELECT nt FROM tot) + $b AS DOUBLE))
       |         - ln(CAST(coalesce(bb.cr, 0) + 1 AS DOUBLE)
       |              / CAST((SELECT nr FROM tot) + $b AS DOUBLE)) AS logratio
       |  FROM range($b) r LEFT JOIN bb ON r.range = bb.b),
       |w AS (
       |  SELECT d.doc_id, CAST(coalesce(sum(db.n), 0) AS BIGINT) AS n_tokens,
       |         round(coalesce(
       |           sum(CAST(db.n AS DOUBLE) * ratio.logratio), 0.0), 6)
       |           AS log_weight
       |  FROM documents d
       |  LEFT JOIN db ON d.doc_id = db.doc_id
       |  LEFT JOIN ratio ON db.b = ratio.b
       |  GROUP BY d.doc_id)""".stripMargin

  /** DuckDB replay of [[importanceWeights]] + top-`k` head selection over
    * a `documents` table: identical md5 buckets, identical smoothed log
    * terms from the same exact integer counts, per-doc sum under round6,
    * rank on (rounded weight desc, doc_id asc).
    */
  def selectOracleSql(targetPredSql: String, b: Int, k: Int,
                      toksSql: String): String =
    s"""WITH ${weightsCtes(targetPredSql, b, toksSql)}
       |SELECT doc_id, n_tokens, log_weight,
       |       CAST(row_number() OVER (
       |         ORDER BY log_weight DESC, doc_id ASC) AS BIGINT) AS rank
       |FROM w
       |QUALIFY rank <= $k""".stripMargin

  /** DuckDB replay of [[importanceWeights]] + [[gumbelTopK]]: the same
    * weights chain, Gumbel key from the seeded md5 coin, top-k on the
    * rounded key with id ties.
    */
  def sampleOracleSql(targetPredSql: String, b: Int, k: Int, seed: String,
                      toksSql: String): String =
    s"""WITH ${weightsCtes(targetPredSql, b, toksSql)},
       |g AS (
       |  SELECT doc_id, n_tokens, log_weight,
       |         round(log_weight - ln(-ln(
       |           ('0x' || substring(md5('$seed:' ||
       |              CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |             / 4294967296.0)), 6) AS gk
       |  FROM w)
       |SELECT doc_id, n_tokens, log_weight,
       |       CAST(row_number() OVER (
       |         ORDER BY gk DESC, doc_id ASC) AS BIGINT) AS rank
       |FROM g
       |QUALIFY rank <= $k""".stripMargin
}
