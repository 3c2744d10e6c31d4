package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge TRAINING — the tokenizer-construction step of
  * a training-data pipeline (the counting-side complement of
  * [[TextFunctions]]' BPE-ish piece estimator). Classic algorithm: every
  * word starts as its character sequence; k times, count adjacent symbol
  * pairs across the corpus weighted by word frequency, merge the most
  * frequent pair everywhere (greedy left-to-right within a word), emit
  * the merge table — which IS the trained tokenizer artifact.
  *
  * Scale shape — the industrial trainer structure, distributed: the
  * corpus is touched ONCE (token explode → word-frequency aggregate);
  * every iteration thereafter runs on the WORD-COUNT frame (distinct
  * vocabulary, millions of rows at 100 TB — not the corpus), exactly how
  * single-node BPE trainers operate on the word→freq map, except the map
  * itself is a distributed frame. Per iteration: one pair-explode +
  * hash aggregate (pair-cardinality shuffle), a 1-row argmax collect,
  * and a pure-expression fold applying the merge (no UDF); the frame is
  * checkpointed per iteration to keep lineage flat. Driver state is the
  * k-row merge table.
  *
  * Determinism: argmax tie-break is (count desc, left asc, right asc) —
  * a total order, so the merge sequence is a pure function of the
  * corpus. That makes training SQL-replayable after all: the k chained
  * data-dependent argmaxes unroll into k MATERIALIZED CTE blocks (pair
  * counts → 1-row best → merge applied by the same delimiter-wrapped
  * replace as [[encodeOracleSql]]) — the [[LogReg.oracleCtes]]
  * discipline applied to a discrete recurrence, where exact integer
  * counts make the replay trivially bit-stable ([[trainOracleSql]]).
  * BpeSpec additionally gates the hand-computable fixture, the
  * non-increasing-count invariant, and merge-table closure.
  */
object Bpe {

  /** Corpus → (word, freq): the ONE corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Train up to `k` merges over a (word, freq) frame; stops early when
    * no pair repeats. Returns (rank, left, right, merged, pair_count).
    */
  def train(words: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = words.sparkSession
    import spark.implicits._
    // (?!^) splits before every char but the first → character symbols;
    // Spark's split keeps a trailing empty match — drop it
    var cur = words
      .select(col("freq"),
        org.apache.spark.sql.functions.filter(
          split(col("w"), "(?!^)"), s => s =!= "").as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val adj = transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))
      val best = cur
        .select(col("freq"), explode(when(size(col("syms")) >= 2, adj)
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .filter(col("c") >= 2) // a pair seen once is not worth a merge
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      best.headOption match {
        case Some(Row(l: String, r: String, c: Long)) =>
          merges += ((rank, l, r, l + r, c))
          cur = cur.withColumn("syms", applyMerge(col("syms"), l, r))
            .localCheckpoint(true)
          rank += 1
        case _ => done = true // no pair seen twice — training converged
      }
    }
    merges.result()
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** End-to-end: corpus → word counts → k merges. */
  def trainOnCorpus(docs: DataFrame, textCol: String, k: Int): DataFrame =
    train(wordCounts(docs, textCol), k)

  /** Greedy left-to-right application of one merge (l, r) → l+r over a
    * symbol array, as a pure-expression fold — shared by [[train]] and
    * [[encodeStats]]. Equivalent to a non-overlapping left-to-right
    * string replace over delimiter-wrapped symbols (each symbol carries
    * its own delimiters, so adjacent matches never share characters) —
    * which is exactly how the DuckDB oracle replays it.
    */
  private[operators] def applyMerge(syms: org.apache.spark.sql.Column,
                                    l: String, r: String): org.apache.spark.sql.Column =
    // BPE's merged spelling is plain concatenation — the merged = l + r
    // special case of the one shared greedy fold (WordPiece strips the
    // right side's ## prefix instead; one implementation, two spellings)
    Wordpiece.applyMerge(syms, l, r, l + r)

  /** ENCODE with a FIXED merge list (the inference half of the
    * tokenizer; [[train]] learns, this applies): per-document token /
    * char / post-merge symbol counts and the chars-per-symbol
    * compression ratio. Pure map-side expression pass + one hash
    * aggregate; documents with no tokens report zeros. A fixed list is
    * what production encode does (the merges ship with the tokenizer),
    * and it keeps the query SQL-oracle-able — the oracle replays the
    * same ordered merges as chained non-overlapping replaces.
    */
  def encodeStats(docs: DataFrame, textCol: String, idCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val chars = org.apache.spark.sql.functions.filter(
      split(col("_tok"), "(?!^)"), s => s =!= "")
    val folded = merges.foldLeft(chars) { case (acc, (l, r)) =>
      applyMerge(acc, l, r)
    }
    val per = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(col("doc_id"), length(col("_tok")).cast("long").as("_nc"),
        size(folded).cast("long").as("_ns"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("_nc")).as("n_chars"),
        sum(col("_ns")).as("n_symbols"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_symbols"), lit(0L)).as("n_symbols"),
        round(col("n_chars").cast("double") /
          nullif(col("n_symbols").cast("double"), lit(0.0)), 6)
          .as("compression"))
  }

  /** DuckDB replay of [[train]]+[[wordCounts]]: k unrolled iteration
    * blocks over the word-count frame. Each symbol sequence lives as a
    * delimiter-wrapped string (`|c1||c2|…`); per iteration the symbol
    * list is re-derived by regexp, adjacent pairs explode via a
    * list-comprehension zip, the 1-row argmax materializes with the
    * same (count desc, left asc, right asc) total order, and the merge
    * applies as ONE non-overlapping left-to-right `replace` — exactly
    * [[applyMerge]]'s greedy fold (each symbol carries its own
    * delimiters, so adjacent matches never share characters). All
    * counts are exact integers, so the replay is bit-stable with no
    * rounding discipline needed. Early stop falls out structurally: an
    * empty best CTE contributes no row and nulls the working strings,
    * so later iterations stay empty too.
    */
  def trainOracleSql(k: Int, toksSql: String): String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""wc AS MATERIALIZED (
               |  SELECT w, CAST(count(*) AS BIGINT) AS freq
               |  FROM (SELECT unnest($toksSql) AS w FROM documents)
               |  GROUP BY w)""".stripMargin
    ctes += """cur0 AS MATERIALIZED (
              |  SELECT freq, regexp_replace(w, '(.)', '|\1|', 'g') AS s
              |  FROM wc)""".stripMargin
    for (t <- 1 to k) {
      val p = t - 1
      ctes += s"""syms$t AS (
                 |  SELECT freq, regexp_extract_all(s, '\\|([^|]+)\\|', 1) AS y
                 |  FROM cur$p),
                 |pairs$t AS (
                 |  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c
                 |  FROM (SELECT freq,
                 |          unnest(list_transform(range(1, len(y)),
                 |                 i -> struct_pack(l := y[i], r := y[i+1]))) AS p
                 |        FROM syms$t WHERE len(y) >= 2)
                 |  GROUP BY 1, 2 HAVING sum(freq) >= 2),
                 |best$t AS MATERIALIZED (
                 |  SELECT $t AS rank, l, r, c FROM pairs$t
                 |  ORDER BY c DESC, l ASC, r ASC LIMIT 1),
                 |cur$t AS MATERIALIZED (
                 |  SELECT freq,
                 |    replace(s,
                 |      '|' || (SELECT l FROM best$t) || '||' || (SELECT r FROM best$t) || '|',
                 |      '|' || (SELECT l FROM best$t) || (SELECT r FROM best$t) || '|') AS s
                 |  FROM cur$p)""".stripMargin
    }
    val union = (1 to k).map(t => s"SELECT * FROM best$t").mkString(" UNION ALL ")
    s"""WITH ${ctes.result().mkString(",\n")}
       |SELECT CAST(rank AS INT) AS rank, l AS "left", r AS "right",
       |       l || r AS merged, c AS pair_count
       |FROM ($union) WHERE l IS NOT NULL ORDER BY rank""".stripMargin
  }

  /** Tokenizer FERTILITY by group (the per-language fairness eval every
    * multilingual tokenizer ships with): chars-per-symbol under a FIXED
    * merge list, aggregated per `groupCol` (typically language) — a
    * tokenizer trained on one language's statistics fragments the others
    * into more symbols, and this is the query that quantifies it. Same
    * pure-expression greedy fold as [[encodeStats]], one hash aggregate
    * at group grain; exact integer tallies, ONE division per group.
    */
  def fertilityByGroup(docs: DataFrame, textCol: String, groupCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    val chars = org.apache.spark.sql.functions.filter(
      split(col("_tok"), "(?!^)"), s => s =!= "")
    val folded = merges.foldLeft(chars) { case (acc, (l, r)) =>
      applyMerge(acc, l, r)
    }
    docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .select(col(groupCol), length(col("_tok")).cast("long").as("_nc"),
        size(folded).cast("long").as("_ns"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("_nc")).as("n_chars"),
        sum(col("_ns")).as("n_symbols"))
      .select(col(groupCol), col("n_tokens"), col("n_chars"), col("n_symbols"),
        round(col("n_chars").cast("double") /
          nullif(col("n_symbols").cast("double"), lit(0.0)), 6)
          .as("fertility"))
  }

  /** DuckDB replay of [[fertilityByGroup]] — the [[encodeOracleSql]]
    * replace chain aggregated at group grain.
    */
  def fertilityOracleSql(merges: Seq[(String, String)], groupCol: String,
                         toksSql: String): String = {
    val chain = merges.foldLeft("regexp_replace(tok, '(.)', '|\\1|', 'g')") {
      case (acc, (l, r)) => s"replace($acc, '|$l||$r|', '|${l + r}|')"
    }
    s"""WITH t AS (SELECT $groupCol, unnest($toksSql) AS tok FROM documents),
       |c AS (SELECT $groupCol, length(tok) AS nc,
       |             len(regexp_extract_all($chain, '\\|[^|]+\\|')) AS ns
       |      FROM t)
       |SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(nc) AS BIGINT) AS n_chars,
       |       CAST(sum(ns) AS BIGINT) AS n_symbols,
       |       round(CAST(sum(nc) AS DOUBLE)
       |             / nullif(CAST(sum(ns) AS DOUBLE), 0.0), 6) AS fertility
       |FROM c GROUP BY $groupCol""".stripMargin
  }

  /** DuckDB replay of [[encodeStats]]: wrap every char in its own
    * delimiters, apply the merges as chained left-to-right
    * non-overlapping replaces (order = merge order), count symbol
    * blocks. Generated from the same merge list so engines cannot
    * drift.
    */
  def encodeOracleSql(merges: Seq[(String, String)], toksSql: String): String = {
    val chain = merges.foldLeft("regexp_replace(tok, '(.)', '|\\1|', 'g')") {
      case (acc, (l, r)) => s"replace($acc, '|$l||$r|', '|${l + r}|')"
    }
    s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |c AS (SELECT doc_id, length(tok) AS nc,
       |             len(regexp_extract_all($chain, '\\|[^|]+\\|')) AS ns
       |      FROM t),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |               CAST(sum(nc) AS BIGINT) AS n_chars,
       |               CAST(sum(ns) AS BIGINT) AS n_symbols
       |        FROM c GROUP BY 1)
       |SELECT d.doc_id, coalesce(agg.n_tokens, 0) AS n_tokens,
       |       coalesce(agg.n_chars, 0) AS n_chars,
       |       coalesce(agg.n_symbols, 0) AS n_symbols,
       |       round(CAST(coalesce(agg.n_chars, 0) AS DOUBLE)
       |             / nullif(CAST(coalesce(agg.n_symbols, 0) AS DOUBLE),
       |                      0.0), 6) AS compression
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
  }
}
